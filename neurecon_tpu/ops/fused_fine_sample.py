"""Fused VolSDF §3.4 fine sampler — a Pallas TPU kernel family per ray tile.

The VolSDF analogue of `ops/fused_upsample.py`, and the heavier one: VolSDF
is the slowest framework (~47 ms/step; 8.7k rays/s vs NeuS 14.2k), and its
`fine_sample` (models/frameworks/volsdf.py:77-165) runs max_iter rounds of
{error-bound-guided det upsample of N_up points -> MLP re-query -> sorted
merge into a buffer growing to N0 + max_iter*N_up -> convergence bookkeeping
-> a max_bisection-step beta bisection whose predicate is a full
`error_bound` sweep of the merged buffer}. On the XLA path every round is
tens of fusion boundaries with the growing buffers round-tripping HBM; here
each round runs as two fused kernels (upsample+MLP-re-query with the
surface weights VMEM-resident, and a weight-free checkpoint+bisection) with
XLA's native stable sort doing the merge between them — see the staging
note above `_make_upsample_query_kernel` for the measured Mosaic limits
that dictated this shape vs the NeuS single-megakernel design.

Toolbox shared with the NeuS megakernel (same Mosaic constraints — no
sort/gather/scan): `make_point_query` (matmul positional encoding + full
layer chain), `_cumsum_lanes` (lane-chunked triangular-matmul prefix sums —
a full [S, S] triangular constant would not fit VMEM at the DTU config's
S ~ 3k), `invert_cdf_counting` (lane-chunked one-hot gathers).

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
                             invert_cdf_counting, make_point_query)


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


def _q_sdf_closure(rec, F, wb, D, skips, use_siren, sphere_bg_r):
    """Point query (MLP along the tile's rays) + VolSDF's sphere-background
    min-trick (volsdf.py forward_surface: sdf = min(sdf, R - |x|)); with
    normalized d, |o + t d|^2 = |o|^2 + 2 t (o . d) + t^2 — elementwise."""
    q_raw = make_point_query(rec, F, wb, D, skips, use_siren)
    if sphere_bg_r is None:
        return q_raw
    oo = (rec[:, 0:1] ** 2 + rec[:, 1:2] ** 2 + rec[:, 2:3] ** 2)
    od = (rec[:, 0:1] * rec[:, 3:4] + rec[:, 1:2] * rec[:, 4:5]
          + rec[:, 2:3] * rec[:, 5:6])

    def q_sdf(dv):
        nrm = jnp.sqrt(jnp.maximum(oo + 2.0 * od * dv + dv * dv, 0.0))
        return jnp.minimum(q_raw(dv), sphere_bg_r - nrm)

    return q_sdf


# State vector layout in the [T, 128] carry between the staged kernels:
# lane 0 = beta, 1 = mask (still above eps), 2 = iter_usage, 3 = converged.
def _pack_state(beta, mask, iter_usage, converged):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.where(lane == 0, beta,
                     jnp.where(lane == 1, mask.astype(jnp.float32),
                               jnp.where(lane == 2, iter_usage,
                                         jnp.where(lane == 3,
                                                   converged.astype(
                                                       jnp.float32), 0.0))))


def _make_init_kernel(D: int, skips: tuple, use_siren: bool, n0: int,
                      n_final: int, eps: float, sphere_bg_r):
    """Stage 0: coarse SDF query, initial beta+ (paper eq. 10), initial
    convergence checkpoint + inverse-CDF draw, initial bounds."""
    ln1eps = math.log(1.0 + eps)

    def kernel(rec_ref, di_ref, u_ref, F_ref, *refs):
        sdf_ref, bounds_ref, state_ref, fine_ref = refs[-4:]
        wb = [r[:] for r in refs[:-4]]
        rec = rec_ref[:]
        q_sdf = _q_sdf_closure(rec, F_ref[:], wb, D, skips, use_siren,
                               sphere_bg_r)
        far = rec[:, 6:7]                      # [T, 1]
        alpha_net = rec[:, 7:8]
        beta_net = rec[:, 8:9]

        # init beta+ s.t. the uniform-sampling bound == eps (paper eq. 10)
        beta = jnp.sqrt((far ** 2) / (4.0 * (n0 - 1) * ln1eps))

        d_vals = di_ref[:]                     # [T, n0]
        sdf = q_sdf(d_vals)

        nb_max = jnp.max(_error_bound(d_vals, sdf, alpha_net, beta_net),
                         axis=-1, keepdims=True)          # [T, 1]
        mask = nb_max > eps
        bounds = jnp.clip(_error_bound(d_vals, sdf, 1.0 / beta, beta),
                          0.0, 1e5)

        final = _invert_opacity(d_vals, sdf, alpha_net, beta_net, u_ref[:])
        iter_usage = jnp.where(mask, -1.0, 0.0)           # [T, 1]
        converged = ~mask

        sdf_ref[:] = sdf
        bounds_ref[:] = jnp.pad(bounds, ((0, 0), (0, 1)))
        state_ref[:] = _pack_state(beta, mask, iter_usage, converged)
        fine_ref[:] = final

    return kernel


# Why the staged kernel family (init / upsample+merge / checkpoint), not one
# megakernel: the whole fine_sample loop as ONE kernel (the round-2 design)
# blows up the Mosaic compiler. Measured 2026-08-18 on v5e: at max_iter=1
# the unrolled program needed 111.9 MB VMEM (96 MB budget); with the
# bisection rolled into a fori_loop and a 127 MB budget max_iter<=2 compiled
# (108 s / 191 s) but max_iter=4 crashed the compile helper; split per-round
# the round-3 kernel still spilled 166 MB of vregs — Mosaic's register
# allocator spills ~every intermediate value, so the binding constraint is
# TOTAL value bytes per program, and chunking tensors finer does not help
# (166.09 -> 166.55 MB). Per-round-half programs fit. The buffers round-trip
# HBM between stages (~1 MB — noise next to the kernel's VMEM traffic).


def _make_upsample_query_kernel(D: int, skips: tuple, use_siren: bool,
                                s_in: int, n_up: int, sphere_bg_r):
    """Round first half: error-bound-guided det upsample of n_up points ->
    MLP re-query. The only stage needing the MLP weights. The sorted merge
    into the growing buffer happens OUTSIDE the kernel with XLA's native
    stable sort: the counting-scatter merge (one-hot positions, the NeuS
    kernel's trick) is O(S^2) one-hot values, and at VolSDF's widths
    (S growing to 640 vs NeuS's 128) that alone spilled >100 MB of vregs —
    measured 2026-08-19: with the in-kernel merge this stage dies at
    s_in=384 (163 MB spill), without it every stage compiles in <0.5 min."""

    def kernel(rec_ref, d_ref, bounds_ref, F_ref, *refs):
        up_out_ref, sdf_out_ref = refs[-2:]
        wb = [r[:] for r in refs[:-2]]
        rec = rec_ref[:]
        q_sdf = _q_sdf_closure(rec, F_ref[:], wb, D, skips, use_siren,
                               sphere_bg_r)
        d_vals = d_ref[:]                      # [T, s_in]
        bounds = bounds_ref[:][:, :s_in - 1]

        # det upsample uniforms: linspace(0, 1, n_up + 2), endpoints dropped
        # after inversion exactly like the XLA path. Built from an integer
        # iota: jnp.linspace lowers to a FLOAT lax.iota, which real Mosaic's
        # verifier rejects ('tpu.iota' result must be integer vector).
        u_up = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, n_up + 2), 1)
            .astype(jnp.float32) / float(n_up + 1),
            (d_vals.shape[0], n_up + 2))

        w5 = bounds + 1e-5
        pdf = w5 / jnp.sum(w5, axis=-1, keepdims=True)
        cdf = _shift_lanes(_cumsum_lanes(pdf, strict=False),
                           out_width=pdf.shape[1] + 1)
        upsampled = invert_cdf_counting(d_vals, cdf, u_up)[:, 1:-1]
        up_out_ref[:] = upsampled
        sdf_out_ref[:] = q_sdf(upsampled)

    return kernel


def _make_checkpoint_kernel(s: int, it: int, max_bisection: int,
                            n_final: int, eps: float, last: bool):
    """Round second half (weight-free): convergence checkpoint over the
    merged buffer -> fori_loop beta bisection -> new bounds (or, on the last
    round, the not-converged fallback draw)."""

    def kernel(rec_ref, d_ref, sdf_ref, state_ref, ufin_ref, fine_in_ref,
               state_out_ref, fine_ref, *refs):
        rec = rec_ref[:]
        alpha_net = rec[:, 7:8]
        beta_net = rec[:, 8:9]

        d_vals = d_ref[:]                      # [T, s]
        sdf = sdf_ref[:]
        state = state_ref[:]
        beta = state[:, 0:1]
        mask = state[:, 1:2] > 0.5
        iter_usage = state[:, 2:3]
        converged = state[:, 3:4] > 0.5
        final = fine_in_ref[:]

        def u_at(i):
            return ufin_ref[:, i * n_final:(i + 1) * n_final]

        nb_max = jnp.max(_error_bound(d_vals, sdf, alpha_net, beta_net),
                         axis=-1, keepdims=True)
        still_bad = nb_max > eps
        newly = mask & ~still_bad
        cand = _invert_opacity(d_vals, sdf, alpha_net, beta_net, u_at(0))
        final = jnp.where(newly, cand, final)
        iter_usage = jnp.where(newly, float(it), iter_usage)
        converged = converged | newly
        mask = mask & still_bad

        # shape-invariant bisection: rolled, not unrolled (see above)
        def _bisect(_, lr_pair):
            beta_left, beta_right = lr_pair
            beta_tmp = 0.5 * (beta_left + beta_right)
            bmax = jnp.max(
                _error_bound(d_vals, sdf, 1.0 / beta_tmp, beta_tmp),
                axis=-1, keepdims=True)
            good = bmax <= eps
            return (jnp.where(good, beta_left, beta_tmp),
                    jnp.where(good, beta_tmp, beta_right))
        _, beta_right = jax.lax.fori_loop(
            0, max_bisection,
            _bisect, (jnp.broadcast_to(beta_net, beta.shape), beta))
        beta = jnp.where(mask, beta_right, beta)

        if last:
            not_conv = ~converged
            cand = _invert_opacity(d_vals, sdf, 1.0 / beta, beta, u_at(1))
            final = jnp.where(not_conv, cand, final)
            iter_usage = jnp.where(not_conv, -1.0, iter_usage)
            beta = jnp.where(converged, beta_net, beta)
        else:
            bounds_out_ref = refs[0]
            bounds = jnp.clip(
                _error_bound(d_vals, sdf, 1.0 / beta, beta), 0.0, 1e5)
            bounds_out_ref[:] = jnp.pad(bounds, ((0, 0), (0, 1)))

        state_out_ref[:] = _pack_state(beta, mask, iter_usage, converged)
        fine_ref[:] = final

    return kernel


def _pl_modules():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def _compiler_kwargs(interpret: bool):
    if interpret:
        return {}
    _, pltpu = _pl_modules()
    try:
        vmem_mb = int(os.environ.get("NEURECON_FUSED_VMEM_MB", "120"))
        return {"compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default 16 MB scoped-vmem cap OOMs these kernels; v5e has
            # ~128 MB VMEM/core (a 127 MB budget compiles) — leave room for
            # the (tiny) double-buffered ray-tile IO
            vmem_limit_bytes=vmem_mb * 1024 * 1024)}
    except Exception:
        return {}


def _row_spec(tile, width):
    pl, pltpu = _pl_modules()
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _weight_specs(weight_shapes):
    pl, pltpu = _pl_modules()

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    specs = [full_block((8, 128))]          # the embed constant F
    for (w_shape, b_shape) in weight_shapes:
        specs.append(full_block(w_shape))
        specs.append(full_block(b_shape))
    return specs


@functools.lru_cache(maxsize=None)
def _build_init_call(config_key, tile: int, n0: int, n_final: int,
                     eps: float, sphere_bg_r, weight_shapes,
                     interpret: bool):
    pl, _ = _pl_modules()
    D, skips, use_siren = config_key
    kernel = _make_init_kernel(D, skips, use_siren, n0, n_final, eps,
                               sphere_bg_r)
    in_specs = ([_row_spec(tile, 128), _row_spec(tile, n0),
                 _row_spec(tile, n_final)] + _weight_specs(weight_shapes))
    kwargs = _compiler_kwargs(interpret)

    def call(rec, d_init, u0, F, flat_weights):
        N = rec.shape[0]
        operands = [rec, d_init, u0, F]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=(_row_spec(tile, n0), _row_spec(tile, n0),
                       _row_spec(tile, 128), _row_spec(tile, n_final)),
            out_shape=(
                jax.ShapeDtypeStruct((N, n0), jnp.float32),     # sdf
                jax.ShapeDtypeStruct((N, n0), jnp.float32),     # bounds pad
                jax.ShapeDtypeStruct((N, 128), jnp.float32),    # state
                jax.ShapeDtypeStruct((N, n_final), jnp.float32),
            ),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


@functools.lru_cache(maxsize=None)
def _build_upsample_query_call(config_key, tile: int, s_in: int, n_up: int,
                               sphere_bg_r, weight_shapes, interpret: bool):
    pl, _ = _pl_modules()
    D, skips, use_siren = config_key
    kernel = _make_upsample_query_kernel(D, skips, use_siren, s_in, n_up,
                                         sphere_bg_r)
    in_specs = ([_row_spec(tile, 128), _row_spec(tile, s_in),
                 _row_spec(tile, s_in)]
                + _weight_specs(weight_shapes))
    kwargs = _compiler_kwargs(interpret)

    def call(rec, d_vals, bounds, F, flat_weights):
        N = rec.shape[0]
        operands = [rec, d_vals, bounds, F]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=(_row_spec(tile, n_up), _row_spec(tile, n_up)),
            out_shape=(jax.ShapeDtypeStruct((N, n_up), jnp.float32),
                       jax.ShapeDtypeStruct((N, n_up), jnp.float32)),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


@functools.lru_cache(maxsize=None)
def _build_checkpoint_call(tile: int, s: int, it: int, max_bisection: int,
                           n_final: int, eps: float, interpret: bool,
                           last: bool):
    pl, _ = _pl_modules()
    kernel = _make_checkpoint_kernel(s, it, max_bisection, n_final, eps,
                                     last)
    n_u = (2 if last else 1) * n_final
    in_specs = [_row_spec(tile, 128), _row_spec(tile, s),
                _row_spec(tile, s), _row_spec(tile, 128),
                _row_spec(tile, n_u), _row_spec(tile, n_final)]
    kwargs = _compiler_kwargs(interpret)

    def call(rec, d_vals, sdf, state, u_it, final):
        N = rec.shape[0]
        if last:
            outs = (_row_spec(tile, 128), _row_spec(tile, n_final))
            shapes = (jax.ShapeDtypeStruct((N, 128), jnp.float32),
                      jax.ShapeDtypeStruct((N, n_final), jnp.float32))
        else:
            outs = (_row_spec(tile, 128), _row_spec(tile, n_final),
                    _row_spec(tile, s))
            shapes = (jax.ShapeDtypeStruct((N, 128), jnp.float32),
                      jax.ShapeDtypeStruct((N, n_final), jnp.float32),
                      jax.ShapeDtypeStruct((N, s), jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=outs,
            out_shape=shapes,
            interpret=interpret,
            **kwargs,
        )(rec, d_vals, sdf, state, u_it, final)

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
    tile = int(os.environ.get("NEURECON_FUSED_FINESAMPLE_TILE", tile))
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
    bg = None if sphere_bg_r is None else float(sphere_bg_r)
    u_fin = u_fin.astype(jnp.float32)

    def u_at(i):
        return u_fin[:, i * n_final:(i + 1) * n_final]

    init_call = _build_init_call(config_key, tile, n0, n_final, float(eps),
                                 bg, weight_shapes, interpret)
    d_vals = d_init.astype(jnp.float32)
    sdf, bounds, state, final = init_call(rec, d_vals, u_at(0), F,
                                          flat_weights)

    for it in range(1, max_iter + 1):
        last = it == max_iter
        s_in = n0 + (it - 1) * n_up
        u_it = (jnp.concatenate([u_at(it), u_at(max_iter + 1)], axis=-1)
                if last else u_at(it))
        up_call = _build_upsample_query_call(config_key, tile, s_in, n_up,
                                             bg, weight_shapes, interpret)
        upsampled, new_sdf = up_call(rec, d_vals, bounds, F, flat_weights)
        # stable sorted merge via XLA's native sort (old values win ties,
        # matching merge_sorted_counting's a-before-b ordering)
        d_vals, sdf = jax.lax.sort(
            (jnp.concatenate([d_vals, upsampled], axis=-1),
             jnp.concatenate([sdf, new_sdf], axis=-1)),
            num_keys=1, is_stable=True)
        ck_call = _build_checkpoint_call(tile, s_in + n_up, it,
                                         max_bisection, n_final,
                                         float(eps), interpret, last)
        outs = ck_call(rec, d_vals, sdf, state, u_it, final)
        if last:
            state, final = outs
        else:
            state, final, bounds = outs

    fine = final[:N]
    beta_out = state[:N, 0]
    iter_usage = state[:N, 2].astype(jnp.int32)
    return fine, beta_out, iter_usage
