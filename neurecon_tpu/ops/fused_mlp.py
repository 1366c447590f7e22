"""Fused SDF-MLP forward as a Pallas TPU kernel.

The reference's hottest loop is millions of point queries through the D=8,
W=256 ImplicitSurface MLP (sampler queries, ray casting, the 512^3 mesh grid
— reference mesh_util.py:102-110, neus.py:251-273, volsdf.py:138-195,
ray_casting.py:84,179). A layer-by-layer jnp forward writes every [M, 256]
activation to HBM between layers, so it runs bandwidth-bound well below the
MXU rate. This kernel runs ALL layers on a row-tile of points resident in
VMEM — skip connection, Softplus(beta=100) / SIREN sine and the final sdf
projection included — so intermediate activations never touch HBM.

Used on the gradient-free query paths only (they sit under stop_gradient /
are eval-only), so no custom VJP is needed; the differentiated render pass
keeps the jnp forward. Weight-norm is folded in by materializing effective
weights host-side (tiny [256, 256] work). The skip concat [h, x_embed]/sqrt(2)
is folded into the skip layer as two matmuls (h @ Wa + emb @ Wb) * inv_sqrt2,
avoiding lane-granularity concatenation inside the kernel.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


def fused_mlp_enabled() -> bool:
    """Production gate for the fused kernel: on only when running on real TPU
    hardware (interpreter mode off-TPU is for tests) and not disabled via
    NEURECON_FUSED_MLP=0 (the A/B switch used by bench_ablate)."""
    if os.environ.get("NEURECON_FUSED_MLP", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _padT(w: jnp.ndarray, in_pad: int, out_pad: int) -> jnp.ndarray:
    """[out, in] torch-layout weight -> padded [in_pad, out_pad] (transposed
    for h @ w in the kernel)."""
    wt = w.T
    return jnp.pad(wt, ((0, in_pad - wt.shape[0]), (0, out_pad - wt.shape[1])))


def _pad_b(b: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.pad(b, (0, n - b.shape[0]))[None]  # [1, n] for broadcasting


def build_padded_weights(surface, params):
    """Effective (weight-norm-resolved) weights, transposed and padded to lane
    multiples; skip layers split into (Wa: h-part, Wb: embed-part) sharing one
    bias (the Wb entry gets a zero bias placeholder). Returns a flat list of
    (w_t, b) in kernel order."""
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
            # final projection: only the sdf row (row 0) is needed; output
            # padded to a full 128-lane block
            flat.append((_padT(w[:1], W_pad, 128), _pad_b(b[:1], 128)))
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


def apply_layer_chain(emb, wb, D: int, skips, use_siren: bool):
    """Run the full ImplicitSurface layer chain on VMEM-resident values.

    emb: [M, C_pad] embedded (padded) inputs; wb: flat sequence of loaded
    (w_t, b) arrays in `build_padded_weights` order (skip layers contribute an
    extra (w_emb, zero-bias) pair). Returns the final pre-activation
    [M, 128] whose lane 0 is the sdf. Shared by the fused-MLP kernel and the
    fused-upsampler megakernel.
    """
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    skips = set(skips)

    def act(x):
        if use_siren:
            return jnp.sin(30.0 * x)
        return jax.nn.softplus(100.0 * x) / 100.0

    h = None
    wi = 0
    for l in range(D + 1):
        w_t = wb[2 * wi]
        b = wb[2 * wi + 1]
        if l == 0:
            pre = jnp.dot(emb, w_t, preferred_element_type=jnp.float32) + b
            wi += 1
        elif l in skips:
            w_emb = wb[2 * (wi + 1)]
            pre = (jnp.dot(h, w_t, preferred_element_type=jnp.float32)
                   + jnp.dot(emb, w_emb,
                             preferred_element_type=jnp.float32)
                   ) * inv_sqrt2 + b
            wi += 2
        else:
            pre = jnp.dot(h, w_t, preferred_element_type=jnp.float32) + b
            wi += 1
        if l == D:
            return pre
        h = act(pre)


def _make_kernel(D: int, skips: tuple, use_siren: bool):
    def kernel(emb_ref, *refs):
        out_ref = refs[-1]
        wb = [r[:] for r in refs[:-1]]  # alternating w_t, b values
        out_ref[:] = apply_layer_chain(emb_ref[:], wb, D, skips, use_siren)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_fused_call(config_key, tile: int, C_pad: int, W_pad: int,
                      weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    kernel = _make_kernel(D, skips, use_siren)

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((tile, C_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for (w_shape, b_shape) in weight_shapes:
        in_specs.append(full_block(w_shape))
        in_specs.append(full_block(b_shape))

    compiler_params = None
    if not interpret:
        # "arbitrary" grid semantics let Mosaic keep the constant weight
        # blocks resident in VMEM across grid steps instead of re-DMA-ing
        # them per tile
        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024)
        except Exception:
            compiler_params = None

    def call(emb_padded, flat_weights):
        M = emb_padded.shape[0]
        operands = [emb_padded]
        for (w, b) in flat_weights:
            operands += [w, b]
        out = pl.pallas_call(
            kernel,
            grid=(M // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            interpret=interpret,
            **({"compiler_params": compiler_params} if compiler_params else {}),
        )(*operands)
        return out[:, 0]

    return call


def fused_sdf_forward(surface, params, x, tile: int = 1024,
                      interpret: bool = None):
    """sdf = fused_mlp(x): drop-in for ImplicitSurface.forward(params, x).

    x: [..., input_dim]; returns [...]. Forward-only (use under stop_gradient
    or in eval paths). interpret=None auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    prefix = x.shape[:-1]
    x_flat = x.reshape(-1, x.shape[-1])
    emb = surface.embed_fn(x_flat)  # [M, C_in]
    C_pad = _round_up(surface.input_ch, 128)
    W_pad = _round_up(surface.W, 128)
    emb = jnp.pad(emb, ((0, 0), (0, C_pad - emb.shape[-1])))

    M = emb.shape[0]
    M_pad = _round_up(max(M, tile), tile)
    if M_pad != M:
        emb = jnp.pad(emb, ((0, M_pad - M), (0, 0)))

    flat_weights = build_padded_weights(surface, params)
    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)
    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    call = _build_fused_call(config_key, tile, C_pad, W_pad, weight_shapes,
                             interpret)
    sdf = call(emb, flat_weights)[:M]
    return sdf.reshape(prefix)
