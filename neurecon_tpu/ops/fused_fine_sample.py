"""Fused VolSDF §3.4 fine sampler — one Pallas TPU megakernel per ray tile.

The VolSDF analogue of `ops/fused_upsample.py`, and the heavier one: VolSDF
is the slowest framework (~47 ms/step; 8.7k rays/s vs NeuS 14.2k), and its
`fine_sample` (models/frameworks/volsdf.py:77-165) runs max_iter rounds of
{error-bound-guided det upsample of N_up points -> MLP re-query -> sorted
merge into a buffer growing to N0 + max_iter*N_up -> convergence bookkeeping
-> a max_bisection-step beta bisection whose predicate is a full
`error_bound` sweep of the merged buffer}. On the XLA path every round is
tens of fusion boundaries with the growing buffers round-tripping HBM; here
the whole loop lives in VMEM with the surface weights resident across grid
steps.

Toolbox shared with the NeuS megakernel (same Mosaic constraints — no
sort/gather/scan): `make_point_query` (matmul positional encoding + full
layer chain), `_cumsum_lanes` (lane-chunked triangular-matmul prefix sums —
a full [S, S] triangular constant would not fit VMEM at the DTU config's
S ~ 3k), `invert_cdf_counting`, `merge_sorted_counting` (lane-chunked
one-hot scatters, so peak temporaries stay [T, S, 128] however wide the
buffer grows).

Semantics match `fine_sample` ELEMENTWISE (not just set-wise): the interior
upsample is deterministic there (`sample_pdf(..., det=True)` regardless of
perturb), and the per-checkpoint `invert_opacity` uniforms are drawn by the
caller with the reference key sequence and consumed unsorted, exactly like
`sample_cdf` does. Gradient-free by construction.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fused_mlp import build_padded_weights, _round_up
from .fused_upsample import (_cumsum_lanes, _shift_lanes, build_embed_const,
                             invert_cdf_counting, make_point_query,
                             merge_sorted_counting)


def fused_fine_sample_enabled() -> bool:
    """Opt-in production gate: NEURECON_FUSED_FINESAMPLE=1 on a real TPU;
    the value "interpret" enables it on any backend for CPU tests."""
    val = os.environ.get("NEURECON_FUSED_FINESAMPLE", "0")
    if val == "interpret":
        return True
    if val != "1":
        return False
    return jax.default_backend() == "tpu"


def _sigma(sdf, alpha_, beta_):
    """sdf_to_sigma (volsdf.py:39-43): scaled Laplace CDF of -sdf."""
    e = 0.5 * jnp.exp(-jnp.abs(sdf) / beta_)
    psi = jnp.where(sdf >= 0, e, 1.0 - e)
    return alpha_ * psi


def _error_bound(d, sdf, alpha_, beta_):
    """volsdf.error_bound with the chunked-matmul cumsums. d/sdf [T, S],
    alpha_/beta_ [T, 1] -> bounds [T, S-1] (NaN -> +inf like the ref)."""
    sig = _sigma(sdf, alpha_, beta_)
    sdf_abs = jnp.abs(sdf)
    delta = d[:, 1:] - d[:, :-1]
    r_t = _cumsum_lanes(sig[:, :-1] * delta, strict=True)
    d_star = jnp.maximum(
        0.5 * (sdf_abs[:, :-1] + sdf_abs[:, 1:] - delta), 0.0)
    errors = alpha_ / (4.0 * beta_) * (delta ** 2) * jnp.exp(-d_star / beta_)
    errors_t = _cumsum_lanes(errors, strict=False)
    bounds = jnp.exp(-r_t) * (jnp.exp(errors_t) - 1.0)
    return jnp.where(bounds != bounds, jnp.inf, bounds)


def _invert_opacity(d, sdf, alpha_, beta_, u):
    """sample_cdf over the opacity approximation (volsdf.py:67-96): the
    final-samples inverse-CDF at a convergence checkpoint."""
    sig = _sigma(sdf, alpha_, beta_)
    delta = d[:, 1:] - d[:, :-1]
    r_t = _cumsum_lanes(sig[:, :-1] * delta, strict=True)   # [T, S-1]
    opacity = 1.0 - jnp.exp(-r_t)
    cdf = _shift_lanes(opacity, out_width=opacity.shape[1] + 1)
    return invert_cdf_counting(d, cdf, u)


def _make_fine_sample_kernel(D: int, skips: tuple, use_siren: bool,
                             n0: int, n_up: int, max_iter: int,
                             max_bisection: int, n_final: int, eps: float,
                             sphere_bg_r):
    ln1eps = math.log(1.0 + eps)

    def kernel(rec_ref, di_ref, u_ref, F_ref, *refs):
        fine_ref, aux_ref = refs[-2], refs[-1]
        wb = [r[:] for r in refs[:-2]]
        rec = rec_ref[:]
        q_raw = make_point_query(rec, F_ref[:], wb, D, skips, use_siren)
        if sphere_bg_r is None:
            q_sdf = q_raw
        else:
            # VolSDF's sphere-background min-trick (volsdf.py forward_surface:
            # sdf = min(sdf, R - |x|)); with normalized d,
            # |o + t d|^2 = |o|^2 + 2 t (o . d) + t^2 — pure elementwise
            oo = (rec[:, 0:1] ** 2 + rec[:, 1:2] ** 2 + rec[:, 2:3] ** 2)
            od = (rec[:, 0:1] * rec[:, 3:4] + rec[:, 1:2] * rec[:, 4:5]
                  + rec[:, 2:3] * rec[:, 5:6])

            def q_sdf(dv):
                nrm = jnp.sqrt(jnp.maximum(oo + 2.0 * od * dv + dv * dv,
                                           0.0))
                return jnp.minimum(q_raw(dv), sphere_bg_r - nrm)
        far = rec[:, 6:7]                      # [T, 1]
        alpha_net = rec[:, 7:8]
        beta_net = rec[:, 8:9]

        def u_at(i):
            return u_ref[:, i * n_final:(i + 1) * n_final]

        # init beta+ s.t. the uniform-sampling bound == eps (paper eq. 10)
        beta = jnp.sqrt((far ** 2) / (4.0 * (n0 - 1) * ln1eps))
        alpha = 1.0 / beta

        d_vals = di_ref[:]                     # [T, n0]
        sdf = q_sdf(d_vals)

        nb_max = jnp.max(_error_bound(d_vals, sdf, alpha_net, beta_net),
                         axis=-1, keepdims=True)          # [T, 1]
        mask = nb_max > eps
        bounds = jnp.clip(_error_bound(d_vals, sdf, alpha, beta), 0.0, 1e5)

        final = _invert_opacity(d_vals, sdf, alpha_net, beta_net, u_at(0))
        iter_usage = jnp.where(mask, -1.0, 0.0)           # [T, 1]
        converged = ~mask

        # det upsample uniforms: linspace(0, 1, n_up + 2), endpoints dropped
        # after inversion exactly like the XLA path
        u_up = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_up + 2)[None],
            (d_vals.shape[0], n_up + 2))

        for it in range(1, max_iter + 1):
            w5 = bounds + 1e-5
            pdf = w5 / jnp.sum(w5, axis=-1, keepdims=True)
            cdf = _shift_lanes(_cumsum_lanes(pdf, strict=False),
                               out_width=pdf.shape[1] + 1)
            upsampled = invert_cdf_counting(d_vals, cdf, u_up)[:, 1:-1]
            new_sdf = q_sdf(upsampled)
            d_vals, sdf = merge_sorted_counting(
                d_vals, upsampled, extras_a=(sdf,), extras_b=(new_sdf,))

            nb_max = jnp.max(_error_bound(d_vals, sdf, alpha_net, beta_net),
                             axis=-1, keepdims=True)
            still_bad = nb_max > eps
            newly = mask & ~still_bad
            cand = _invert_opacity(d_vals, sdf, alpha_net, beta_net,
                                   u_at(it))
            final = jnp.where(newly, cand, final)
            iter_usage = jnp.where(newly, float(it), iter_usage)
            converged = converged | newly
            mask = mask & still_bad

            beta_right = beta
            beta_left = jnp.broadcast_to(beta_net, beta.shape)
            for _ in range(max_bisection):
                beta_tmp = 0.5 * (beta_left + beta_right)
                bmax = jnp.max(
                    _error_bound(d_vals, sdf, 1.0 / beta_tmp, beta_tmp),
                    axis=-1, keepdims=True)
                good = bmax <= eps
                beta_right = jnp.where(good, beta_tmp, beta_right)
                beta_left = jnp.where(good, beta_left, beta_tmp)
            beta = jnp.where(mask, beta_right, beta)
            alpha = 1.0 / beta
            bounds = jnp.clip(_error_bound(d_vals, sdf, alpha, beta),
                              0.0, 1e5)

        not_conv = ~converged
        cand = _invert_opacity(d_vals, sdf, alpha, beta, u_at(max_iter + 1))
        final = jnp.where(not_conv, cand, final)
        iter_usage = jnp.where(not_conv, -1.0, iter_usage)
        beta_out = jnp.where(converged, beta_net, beta)   # [T, 1]

        fine_ref[:] = final
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        aux_ref[:] = jnp.where(lane == 0, beta_out,
                               jnp.where(lane == 1, iter_usage, 0.0))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(config_key, tile: int, n0: int, n_up: int, max_iter: int,
                max_bisection: int, n_final: int, eps: float,
                sphere_bg_r, weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    kernel = _make_fine_sample_kernel(D, skips, use_siren, n0, n_up,
                                      max_iter, max_bisection, n_final, eps,
                                      sphere_bg_r)
    n_u = (max_iter + 2) * n_final

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, n0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, n_u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full_block((8, 128)),
    ]
    for (w_shape, b_shape) in weight_shapes:
        in_specs.append(full_block(w_shape))
        in_specs.append(full_block(b_shape))

    kwargs = {}
    if not interpret:
        try:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the default 16 MB scoped-vmem cap OOMs these kernels;
                # v5e VMEM is 128 MB/core, leave room for double buffers
                vmem_limit_bytes=96 * 1024 * 1024)
        except Exception:
            pass

    def call(rec, d_init, u_fin, F, flat_weights):
        N = rec.shape[0]
        operands = [rec, d_init, u_fin, F]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((tile, n_final), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N, n_final), jnp.float32),
                jax.ShapeDtypeStruct((N, 128), jnp.float32),
            ),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


def fused_fine_sample(surface, params, rays_o, rays_d, d_init, far,
                      alpha_net, beta_net, u_fin, *, eps: float,
                      max_iter: int, max_bisection: int, n_final: int,
                      n_up: int, sphere_bg_r: float = None, tile: int = 8,
                      interpret: bool = None):
    """(fine [N, n_final], beta_out [N], iter_usage [N] int32): drop-in for
    `fine_sample` given the same inputs plus the pre-drawn per-checkpoint
    uniforms u_fin [N, (max_iter+2)*n_final] (reference key order, unsorted).

    rays_o/rays_d [N, 3] (d normalized), d_init [N, n0] sorted, far [N, 1],
    alpha_net/beta_net scalars (the model's current Laplace params).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, n0 = d_init.shape
    rec = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         jnp.broadcast_to(jnp.asarray(far, jnp.float32).reshape(-1, 1),
                          (N, 1)),
         jnp.full((N, 1), 1.0, jnp.float32) * alpha_net,
         jnp.full((N, 1), 1.0, jnp.float32) * beta_net], axis=-1)
    rec = jnp.pad(rec, ((0, 0), (0, 128 - rec.shape[1])))
    F = jnp.asarray(build_embed_const(surface.embed_multires))
    flat_weights = build_padded_weights(surface, params)
    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)

    N_pad = _round_up(max(N, tile), tile)
    if N_pad != N:
        pad = ((0, N_pad - N), (0, 0))
        rec = jnp.pad(rec, pad)
        d_init = jnp.pad(d_init, pad, mode="edge")
        u_fin = jnp.pad(u_fin, pad, mode="edge")

    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    call = _build_call(config_key, tile, n0, n_up, max_iter, max_bisection,
                       n_final, float(eps),
                       None if sphere_bg_r is None else float(sphere_bg_r),
                       weight_shapes, interpret)
    fine, aux = call(rec, d_init.astype(jnp.float32),
                     u_fin.astype(jnp.float32), F, flat_weights)
    fine = fine[:N]
    beta_out = aux[:N, 0]
    iter_usage = aux[:N, 1].astype(jnp.int32)
    return fine, beta_out, iter_usage
