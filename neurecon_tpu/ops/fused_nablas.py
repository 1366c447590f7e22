"""Fused SDF forward + analytic input-gradient (nablas) — Pallas TPU kernel.

Eval renders with normals are dominated by `forward_with_nablas` on
~18M points/frame (rgb+depth+normals at 360x400 x 128 samples): the XLA
path runs jax.grad's reverse sweep with every activation round-tripping
HBM (~2.3 MB/ray of residuals). This kernel computes sdf, geo features,
AND d(sdf)/dx in one VMEM-resident pass per point tile: forward chain with
pre-activations kept on-chip, then a hand-written reverse sweep —
g <- (g * act'(pre_l)) @ W_l^T — using the same (already transposed)
weight blocks via dot_general's transposed-RHS form, ending in the
positional-encoding pullback dx = (g_emb * sel) @ F^T with
sel = idmask ? 1 : cos(phase).

INPUT-gradient only — this is NOT a custom VJP; parameters are constants
here. Use on gradient-free eval paths only (the production gate refuses to
install itself into the differentiated train step: jax will raise on the
missing VJP if you try). Ref parity: models/base.py:259-276.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fused_mlp import _padT, _pad_b, _round_up
from .fused_upsample import build_embed_const


def fused_nablas_enabled() -> bool:
    """Opt-in gate for EVAL tools: NEURECON_FUSED_NABLAS=1 on a real TPU
    ("interpret" for CPU tests). Never enable during training — the kernel
    has no VJP, and jax will error if it lands in a differentiated graph."""
    val = os.environ.get("NEURECON_FUSED_NABLAS", "0")
    if val == "interpret":
        return True
    if val != "1":
        return False
    return jax.default_backend() == "tpu"


def build_padded_weights_full(surface, params):
    """Like fused_mlp.build_padded_weights, but the final projection keeps
    ALL rows (sdf + geo features), padded to a lane multiple."""
    from neurecon_tpu.models.base import effective_weight

    C_pad = _round_up(surface.input_ch, 128)
    W_pad = _round_up(surface.W, 128)

    flat = []
    for l in range(surface.D + 1):
        p = params["layers"][l]
        w = effective_weight(p)
        b = p["b"]
        out_dim, in_dim = w.shape
        if l == surface.D:
            out_pad = _round_up(out_dim, 128)
            flat.append((_padT(w, W_pad, out_pad), _pad_b(b, out_pad)))
        elif l in surface.skips:
            h_dim = in_dim - surface.input_ch
            flat.append((_padT(w[:, :h_dim], W_pad, W_pad), _pad_b(b, W_pad)))
            flat.append((_padT(w[:, h_dim:], C_pad, W_pad),
                         jnp.zeros((1, W_pad))))
        elif l == 0:
            flat.append((_padT(w, C_pad, W_pad), _pad_b(b, W_pad)))
        else:
            flat.append((_padT(w, W_pad, W_pad), _pad_b(b, W_pad)))
    return flat


def _make_nablas_kernel(D: int, skips: tuple, use_siren: bool):
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    skip_set = set(skips)

    def act(x):
        return jnp.sin(30.0 * x) if use_siren else jax.nn.softplus(
            100.0 * x) / 100.0

    def act_p(x):
        return 30.0 * jnp.cos(30.0 * x) if use_siren else jax.nn.sigmoid(
            100.0 * x)

    def tdot(g, w_t):
        # g [M, out] x w_t [in, out] -> [M, in]: transposed-RHS matmul
        return jax.lax.dot_general(
            g, w_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(x_ref, F_ref, FT_ref, gsdf_ref, *refs):
        sn_ref, h_ref = refs[-2], refs[-1]
        wb = [r[:] for r in refs[:-2]]
        x = x_ref[:]                                   # [M, 128], xyz in 0:3
        F = F_ref[:]                                   # [8, 128]
        ph = (x[:, 0:1] * F[0:1] + x[:, 1:2] * F[1:2]
              + x[:, 2:3] * F[2:3] + F[3:4])           # [M, 128]
        idmask = F[4:5] > 0.5
        emb = jnp.where(idmask, ph, jnp.sin(ph))

        # ---- forward, keeping every pre-activation resident ----
        pres = []
        h = None
        wi = 0
        for l in range(D + 1):
            w_t = wb[2 * wi]
            b = wb[2 * wi + 1]
            if l == 0:
                pre = jnp.dot(emb, w_t,
                              preferred_element_type=jnp.float32) + b
                wi += 1
            elif l in skip_set:
                w_emb = wb[2 * (wi + 1)]
                pre = (jnp.dot(h, w_t, preferred_element_type=jnp.float32)
                       + jnp.dot(emb, w_emb,
                                 preferred_element_type=jnp.float32)
                       ) * inv_sqrt2 + b
                wi += 2
            else:
                pre = jnp.dot(h, w_t,
                              preferred_element_type=jnp.float32) + b
                wi += 1
            if l == D:
                final = pre                            # [M, out_pad]
            else:
                pres.append(pre)
                h = act(pre)

        # ---- reverse sweep for d(sdf)/dx (params are constants) ----
        M = x.shape[0]
        g_h = jnp.broadcast_to(gsdf_ref[:], (M, gsdf_ref.shape[1]))
        g_emb = jnp.zeros_like(emb)
        # walk layers D-1 .. 0; reconstruct each layer's wb index
        idxs = []
        wi2 = 0
        for l in range(D):
            idxs.append(wi2)
            wi2 += 2 if l in skip_set else 1
        for l in range(D - 1, -1, -1):
            g_pre = g_h * act_p(pres[l])
            w_t = wb[2 * idxs[l]]
            if l == 0:
                g_emb = g_emb + tdot(g_pre, w_t)
                g_h = None
            elif l in skip_set:
                w_emb = wb[2 * (idxs[l] + 1)]
                g_h = tdot(g_pre, w_t) * inv_sqrt2
                g_emb = g_emb + tdot(g_pre, w_emb) * inv_sqrt2
            else:
                g_h = tdot(g_pre, w_t)

        sel = jnp.where(idmask, 1.0, jnp.cos(ph))
        dx = jnp.dot(g_emb * sel, FT_ref[:],
                     preferred_element_type=jnp.float32)  # [M, 128], 0:3

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sdf = jnp.sum(jnp.where(lane == 0, final[:, :128], 0.0), axis=-1,
                      keepdims=True)
        sn_ref[:] = jnp.where(
            lane == 0, sdf,
            jnp.where(lane == 1, dx[:, 0:1],
                      jnp.where(lane == 2, dx[:, 1:2],
                                jnp.where(lane == 3, dx[:, 2:3], 0.0))))
        h_ref[:] = final

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(config_key, tile: int, out_pad: int, W_pad: int,
                weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    kernel = _make_nablas_kernel(D, skips, use_siren)

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full_block((8, 128)),
        full_block((128, 128)),
        full_block((1, W_pad)),
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

    def call(xpad, F, FT, gsdf, flat_weights):
        M = xpad.shape[0]
        operands = [xpad, F, FT, gsdf]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(M // tile,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((tile, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((M, 128), jnp.float32),
                jax.ShapeDtypeStruct((M, out_pad), jnp.float32),
            ),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


def fused_forward_with_nablas(surface, params, x, tile: int = 512,
                              interpret: bool = None):
    """(sdf, nablas, h_geo) = kernel(x): drop-in for
    ImplicitSurface.forward_with_nablas on gradient-free paths.

    x [..., 3]; requires W_geo_feat > 0 (the flagship configs; callers fall
    back to the XLA path otherwise).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert surface.W_geo_feat > 0, "kernel needs the split geo-feature head"
    prefix = x.shape[:-1]
    x_flat = x.reshape(-1, 3).astype(jnp.float32)
    M = x_flat.shape[0]
    xpad = jnp.pad(x_flat, ((0, 0), (0, 125)))

    F_np = build_embed_const(surface.embed_multires)
    F = jnp.asarray(F_np)
    FT = jnp.asarray(np.pad(F_np[0:3].T, ((0, 0), (0, 125))))  # [128, 128]

    flat_weights = build_padded_weights_full(surface, params)
    W_pad = _round_up(surface.W, 128)
    out_pad = flat_weights[-1][0].shape[1]
    # d(sdf)/d(h_D): the final projection's sdf row, as a [1, W_pad] operand
    gsdf = flat_weights[-1][0][:, 0:1].T

    M_pad = _round_up(max(M, tile), tile)
    if M_pad != M:
        xpad = jnp.pad(xpad, ((0, M_pad - M), (0, 0)))

    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)
    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    call = _build_call(config_key, tile, out_pad, W_pad, weight_shapes,
                       interpret)
    sn, hfull = call(xpad, F, FT, gsdf, flat_weights)
    sdf = sn[:M, 0].reshape(prefix)
    nablas = sn[:M, 1:4].reshape(prefix + (3,))
    h_geo = hfull[:M, 1:1 + surface.W_geo_feat].reshape(
        prefix + (surface.W_geo_feat,))
    return sdf, nablas, h_geo
