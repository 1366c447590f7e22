"""Fused surface root-finding — one Pallas TPU kernel per ray tile.

The third megakernel of the family (NeuS upsampler, VolSDF fine-sample,
this): `root_finding_surface_points` (models/ray_casting.py:50-110) marches
N_steps points through the surface MLP, finds the first +->- crossing with
the sign/cost-matrix argmin trick, then runs 8 secant iterations each
querying one point per ray. It is UNISURF's entire sampler
(unisurf.compute_ray_samples) and the `root_finding` mode of the surface
renderer. Here the march, the crossing search (argmin as a masked lane-min
of the lane index — Mosaic has no argmin), the one-hot bracket gathers, and
the secant loop (queries padded to 8 identical lanes so every reshape stays
sublane-aligned) run in VMEM with the MLP weights resident across grid
steps.

Deterministic — no uniforms; matches `root_finding_surface_points`
elementwise. `sphere_bg_r` applies VolSDF's background min-trick so the
kernel can also serve that framework's surface renders.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .fused_mlp import build_padded_weights, _round_up
from .fused_upsample import _shift_lanes, build_embed_const, make_point_query


def fused_root_find_enabled() -> bool:
    """Opt-in gate: NEURECON_FUSED_ROOTFIND=1 on a real TPU; "interpret"
    enables it on any backend for CPU tests."""
    val = os.environ.get("NEURECON_FUSED_ROOTFIND", "0")
    if val == "interpret":
        return True
    if val != "1":
        return False
    return jax.default_backend() == "tpu"


def _make_root_find_kernel(D: int, skips: tuple, use_siren: bool,
                           n_steps: int, n_secant: int, logit_tau: float,
                           fill_inf: bool, sphere_bg_r):
    def kernel(rec_ref, F_ref, *refs):
        aux_ref = refs[-1]
        wb = [r[:] for r in refs[:-1]]
        rec = rec_ref[:]
        q_raw = make_point_query(rec, F_ref[:], wb, D, skips, use_siren)
        if sphere_bg_r is None:
            q_base = q_raw
        else:
            oo = (rec[:, 0:1] ** 2 + rec[:, 1:2] ** 2 + rec[:, 2:3] ** 2)
            od = (rec[:, 0:1] * rec[:, 3:4] + rec[:, 1:2] * rec[:, 4:5]
                  + rec[:, 2:3] * rec[:, 5:6])

            def q_base(dv):
                nrm = jnp.sqrt(jnp.maximum(oo + 2.0 * od * dv + dv * dv,
                                           0.0))
                return jnp.minimum(q_raw(dv), sphere_bg_r - nrm)

        def q(dv):
            return q_base(dv) - logit_tau

        near = rec[:, 6:7]
        far = rec[:, 7:8]
        T = rec.shape[0]
        S = n_steps

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        t = lane.astype(jnp.float32) / float(S - 1)
        d_prop = near * (1.0 - t) + far * t                # [T, S]
        val = q(d_prop)                                    # [T, S]

        mask0 = val[:, 0:1] > 0
        # sign(val_j * val_{j+1}) padded with 1 at the last lane, built
        # from a shift-left matmul instead of the concat idiom (Mosaic
        # rejects lane concats of offset-mismatched slices — see
        # fused_upsample._shift_lanes)
        val_next = _shift_lanes(val, shift=-1)             # [T, S], last=0
        sign_m = jnp.where(lane == S - 1, 1.0,
                           jnp.sign(val * val_next))
        cost = sign_m * (S - lane).astype(jnp.float32)     # S, S-1, ..., 1
        vmin = jnp.min(cost, axis=-1, keepdims=True)
        # first argmin: masked lane-min of the lane index
        idx = jnp.min(jnp.where(cost == vmin, lane, S), axis=-1,
                      keepdims=True)                        # [T, 1] int32
        mask_sign_change = vmin < 0

        oh = lane == idx
        f_high = jnp.sum(jnp.where(oh, val, 0.0), axis=-1, keepdims=True)
        d_high = jnp.sum(jnp.where(oh, d_prop, 0.0), axis=-1, keepdims=True)
        oh1 = lane == jnp.minimum(idx + 1, S - 1)
        f_low = jnp.sum(jnp.where(oh1, val, 0.0), axis=-1, keepdims=True)
        d_low = jnp.sum(jnp.where(oh1, d_prop, 0.0), axis=-1, keepdims=True)

        mask_pos_to_neg = f_high > 0
        mask = mask_sign_change & mask_pos_to_neg & mask0

        def secant_step(f_l, f_h, d_l, d_h):
            denom = f_h - f_l
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            return -f_l * (d_h - d_l) / denom + d_l

        d_pred = secant_step(f_low, f_high, d_low, d_high)  # [T, 1]
        for _ in range(n_secant):
            # query 8 identical lanes: keeps the point-batch sublane-aligned
            f_mid = q(jnp.broadcast_to(d_pred, (T, 8)))[:, 0:1]
            ind_low = f_mid < 0
            d_low = jnp.where(ind_low, d_pred, d_low)
            f_low = jnp.where(ind_low, f_mid, f_low)
            d_high = jnp.where(ind_low, d_high, d_pred)
            f_high = jnp.where(ind_low, f_high, f_mid)
            d_pred = secant_step(f_low, f_high, d_low, d_high)

        miss = jnp.full((T, 1), jnp.inf) if fill_inf else far
        d_out = jnp.where(mask, d_pred, miss)
        d_out = jnp.where(mask0, d_out, 0.0)

        out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        aux_ref[:] = jnp.where(
            out_lane == 0, d_out,
            jnp.where(out_lane == 1, d_pred,
                      jnp.where(out_lane == 2, mask.astype(jnp.float32),
                                jnp.where(out_lane == 3,
                                          mask_sign_change.astype(
                                              jnp.float32), 0.0))))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(config_key, tile: int, n_steps: int, n_secant: int,
                logit_tau: float, fill_inf: bool, sphere_bg_r,
                weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    kernel = _make_root_find_kernel(D, skips, use_siren, n_steps, n_secant,
                                    logit_tau, fill_inf, sphere_bg_r)

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
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

    def call(rec, F, flat_weights):
        N = rec.shape[0]
        operands = [rec, F]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


def fused_root_find(surface, params, rays_o, rays_d, near, far, *,
                    n_steps: int = 256, n_secant: int = 8,
                    logit_tau: float = 0.0, fill_inf: bool = True,
                    sphere_bg_r: float = None, tile: int = 16,
                    interpret: bool = None):
    """Drop-in for root_finding_surface_points(method="secant"): returns
    (d_pred_out [N], pt_pred [N, 3], mask [N] bool, mask_sign_change [N]).

    rays_o/rays_d [N, 3] (d normalized); near/far scalar or [N]/[N, 1].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32).reshape(-1, 1)
                            if jnp.ndim(near) else
                            jnp.full((1, 1), near, jnp.float32), (N, 1))
    far_b = jnp.broadcast_to(jnp.asarray(far, jnp.float32).reshape(-1, 1)
                             if jnp.ndim(far) else
                             jnp.full((1, 1), far, jnp.float32), (N, 1))
    rec = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         near, far_b], axis=-1)
    rec = jnp.pad(rec, ((0, 0), (0, 128 - rec.shape[1])))
    F = jnp.asarray(build_embed_const(surface.embed_multires))
    flat_weights = build_padded_weights(surface, params)
    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)

    N_pad = _round_up(max(N, tile), tile)
    if N_pad != N:
        rec = jnp.pad(rec, ((0, N_pad - N), (0, 0)))

    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    call = _build_call(config_key, tile, n_steps, n_secant, float(logit_tau),
                       bool(fill_inf),
                       None if sphere_bg_r is None else float(sphere_bg_r),
                       weight_shapes, interpret)
    aux = call(rec, F, flat_weights)[:N]
    d_out = aux[:, 0]
    d_pred = aux[:, 1]
    mask = aux[:, 2] > 0.5
    mask_sign_change = aux[:, 3] > 0.5
    pt_pred = jnp.where(mask[:, None],
                        rays_o + d_pred[:, None] * rays_d,
                        jnp.ones((N, 3)))
    sg = jax.lax.stop_gradient
    return sg(d_out), sg(pt_pred), mask, mask_sign_change
