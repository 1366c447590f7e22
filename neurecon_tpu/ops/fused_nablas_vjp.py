"""Train-safe fused SDF forward + nablas with a hand-derived custom VJP.

`ops/fused_nablas.py` fuses the forward + input-gradient sweep into one
VMEM-resident Pallas pass but has no VJP, so the differentiated train step —
whose dominant block is exactly this grad-of-grad through the D=8/W=256
chain (ref models/base.py:265-282 consumed by neus.py:294 / volsdf.py:450 /
unisurf.py:214) — had to keep the plain-XLA path (~76% of the chain's
shape-limited ceiling, docs/performance.md). This module completes the pair:

  op(ws, bs, xpad) -> (sn [M,128], hfull [M,out_pad])   (jax.custom_vjp)

where sn packs sdf (lane 0) and nablas = d(sdf)/dx (lanes 1:4), and hfull is
the final pre-activation (sdf again in lane 0, geo features after). The
boundary sits at the padded transposed *effective* weights, so the
weight-norm reparameterization (g·v/‖v‖) and the un/padding slices stay in
traced XLA and differentiate for free.

The backward is one Pallas kernel per point tile, recompute-style (no HBM
residuals): with output cotangents (s̄ ⊕ n̄ packed in cot_sn, ȳ in cot_h),

  phase 1  forward chain, all pre-activations a_l and inputs h_l resident
  phase 2  primal reverse sweep  u_l = (u_{l+1} ⊙ φ'(a_l)) @ W_lᵀ  (the
           nablas chain itself), keeping every u_l and q_l = u_{l+1}⊙φ'(a_l)
  phase 3  n̄ pushed *forward* through phase 2's chain (its cotangent flow
           runs l=0→D): ḡ_e = (n̄@F)⊙sel, then per layer
             q̄_l = ū_l @ W_l (+ embed split at skips),
             ā_l += q̄_l ⊙ u_{l+1} ⊙ φ''(a_l),   ū_{l+1} = q̄_l ⊙ φ'(a_l),
             W̄_l += ū_lᵀ q_l, ending in W̄_D[:,0] += Σ_m ū_D  — the
           second-order (eikonal) terms, φ'' included
  phase 4  one combined first-order down-sweep for ȳ plus phase 3's ā_l
           injections: ā = ḡ_h ⊙ φ'(a_l) + ā_l^B, W̄_l += h_lᵀ ā,
           b̄_l += Σ ā, ḡ_h = ā @ W_lᵀ, ending in the embedding pullback
           x̄ = ((ē ⊙ sel) + (n̄@F) ⊙ g_e ⊙ sel') @ Fᵀ.

Weight/bias grads accumulate across the point-tile grid in VMEM output
blocks with a constant index map (sequential "arbitrary" grid semantics);
x̄ tiles like the inputs.

Gate: NEURECON_FUSED_NABLAS_VJP=1 on a real TPU ("interpret" for CPU
tests); wired as `training.fused_nablas_vjp` in train.py. Equivalence of
both outputs and all parameter/input grads vs the plain jnp path is tested
in tests/test_fused_nablas_vjp.py (CPU interpret; on-chip A/B in bench).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fused_mlp import _round_up
from .fused_nablas import _build_call, build_padded_weights_full
from .fused_upsample import build_embed_const


def fused_nablas_vjp_enabled() -> bool:
    """Opt-in gate for the TRAIN-PATH fused nablas kernel (custom VJP —
    safe inside jax.grad, unlike NEURECON_FUSED_NABLAS)."""
    val = os.environ.get("NEURECON_FUSED_NABLAS_VJP", "0")
    if val == "interpret":
        return True
    if val != "1":
        return False
    return jax.default_backend() == "tpu"


def _acts(use_siren: bool):
    """(φ, φ', φ'') for the layer nonlinearity. Softplus(β=100) matches
    ref base.py:202; φ'' is the second-order term the eikonal VJP needs."""
    if use_siren:
        return (lambda x: jnp.sin(30.0 * x),
                lambda x: 30.0 * jnp.cos(30.0 * x),
                lambda x: -900.0 * jnp.sin(30.0 * x))
    sig = jax.nn.sigmoid

    def act(x):
        return jax.nn.softplus(100.0 * x) / 100.0

    def act_p(x):
        return sig(100.0 * x)

    def act_pp(x):
        s = sig(100.0 * x)
        return 100.0 * s * (1.0 - s)

    return act, act_p, act_pp


def _layer_flat_idx(D: int, skips: frozenset):
    """flat-weight-list index of each layer (skips own two entries)."""
    idx, wi = [], 0
    for l in range(D + 1):
        idx.append(wi)
        wi += 2 if l in skips else 1
    return idx, wi


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _tdot(g, w_t):
    """g [M, out] x w_t [in, out] -> [M, in] (transposed-RHS matmul)."""
    return jax.lax.dot_general(g, w_t,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _odot(a, b):
    """a [M, in] x b [M, out] -> [in, out] (batch-contracted outer product,
    the weight-gradient form)."""
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _make_bwd_kernel(D: int, skips: tuple, use_siren: bool, n_flat: int):
    from jax.experimental import pallas as pl

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    skip_set = frozenset(skips)
    act, act_p, act_pp = _acts(use_siren)
    lidx, _ = _layer_flat_idx(D, skip_set)

    def kernel(x_ref, F_ref, FT_ref, gsdf_ref, cots_ref, coth_ref, *refs):
        w_refs = refs[:2 * n_flat]
        out_refs = refs[2 * n_flat:]
        xbar_ref, gsdfbar_ref = out_refs[0], out_refs[1]
        grad_refs = out_refs[2:]  # alternating wbar, bbar per flat entry

        @pl.when(pl.program_id(0) == 0)
        def _init():
            gsdfbar_ref[:] = jnp.zeros_like(gsdfbar_ref)
            for r in grad_refs:
                r[:] = jnp.zeros_like(r)

        wb = [r[:] for r in w_refs]

        def W(fi):
            return wb[2 * fi]

        def add_w(fi, val):
            grad_refs[2 * fi][:] += val

        def add_b(fi, val):
            grad_refs[2 * fi + 1][:] += jnp.sum(val, axis=0, keepdims=True)

        x = x_ref[:]
        F = F_ref[:]
        ph = (x[:, 0:1] * F[0:1] + x[:, 1:2] * F[1:2]
              + x[:, 2:3] * F[2:3] + F[3:4])
        idmask = F[4:5] > 0.5
        emb = jnp.where(idmask, ph, jnp.sin(ph))
        sel = jnp.where(idmask, 1.0, jnp.cos(ph))    # de/dph
        dsel = jnp.where(idmask, 0.0, -jnp.sin(ph))  # dsel/dph

        # ---- phase 1: forward, inputs h_l and pre-activations a_l resident
        pres, hs = [], [emb]  # hs[l] = input to layer l
        h = None
        for l in range(D + 1):
            fi = lidx[l]
            b = wb[2 * fi + 1]
            if l == 0:
                pre = _dot(emb, W(fi)) + b
            elif l in skip_set:
                pre = (_dot(h, W(fi)) + _dot(emb, W(fi + 1))) * inv_sqrt2 + b
            else:
                pre = _dot(h, W(fi)) + b
            if l == D:
                break
            pres.append(pre)
            h = act(pre)
            hs.append(h)

        # ---- phase 2: primal nablas sweep, keeping u_l and q_l
        M = x.shape[0]
        us = [None] * (D + 1)
        qs = [None] * D
        us[D] = jnp.broadcast_to(gsdf_ref[:], (M, gsdf_ref.shape[1]))
        g_e = jnp.zeros_like(emb)
        for l in range(D - 1, -1, -1):
            fi = lidx[l]
            q = us[l + 1] * act_p(pres[l])
            qs[l] = q
            if l == 0:
                g_e = g_e + _tdot(q, W(fi))
            elif l in skip_set:
                us[l] = _tdot(q, W(fi)) * inv_sqrt2
                g_e = g_e + _tdot(q, W(fi + 1)) * inv_sqrt2
            else:
                us[l] = _tdot(q, W(fi))

        cots = cots_ref[:]
        # ---- phase 3: second-order terms — n̄ flows l=0→D through phase 2
        t = (cots[:, 1:2] * F[0:1] + cots[:, 2:3] * F[1:2]
             + cots[:, 3:4] * F[2:3])                       # n̄ @ F
        ge_bar = t * sel
        xbar_v = t * g_e * dsel  # ∂n/∂x via sel (lane space, pushed thru Fᵀ)
        abar = [None] * D
        ubar = None
        for l in range(D):
            fi = lidx[l]
            if l == 0:
                qbar = _dot(ge_bar, W(fi))
                add_w(fi, _odot(ge_bar, qs[l]))
            elif l in skip_set:
                qbar = (_dot(ubar, W(fi))
                        + _dot(ge_bar, W(fi + 1))) * inv_sqrt2
                add_w(fi, _odot(ubar, qs[l]) * inv_sqrt2)
                add_w(fi + 1, _odot(ge_bar, qs[l]) * inv_sqrt2)
            else:
                qbar = _dot(ubar, W(fi))
                add_w(fi, _odot(ubar, qs[l]))
            abar[l] = qbar * us[l + 1] * act_pp(pres[l])
            ubar = qbar * act_p(pres[l])
        # seed pullback: u_D = W_D[:, 0]  ⇒  W̄_D[:,0] += Σ_m ū_D (added
        # outside the kernel from this [1, W_pad] output)
        gsdfbar_ref[:] += jnp.sum(ubar, axis=0, keepdims=True)

        # ---- phase 4: combined first-order down-sweep (ȳ + ā^B injections)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, coth_ref.shape[1]), 1)
        ybar = coth_ref[:] + jnp.where(lane == 0, cots[:, 0:1], 0.0)
        fiD = lidx[D]
        add_w(fiD, _odot(hs[D], ybar))
        add_b(fiD, ybar)
        gh = _tdot(ybar, W(fiD))
        ebar = jnp.zeros_like(emb)
        for l in range(D - 1, -1, -1):
            fi = lidx[l]
            a_tot = gh * act_p(pres[l]) + abar[l]
            add_b(fi, a_tot)
            if l == 0:
                add_w(fi, _odot(emb, a_tot))
                ebar = ebar + _tdot(a_tot, W(fi))
            elif l in skip_set:
                add_w(fi, _odot(hs[l], a_tot) * inv_sqrt2)
                add_w(fi + 1, _odot(emb, a_tot) * inv_sqrt2)
                gh = _tdot(a_tot, W(fi)) * inv_sqrt2
                ebar = ebar + _tdot(a_tot, W(fi + 1)) * inv_sqrt2
            else:
                add_w(fi, _odot(hs[l], a_tot))
                gh = _tdot(a_tot, W(fi))
        xbar_v = xbar_v + ebar * sel
        xbar_ref[:] = _dot(xbar_v, FT_ref[:])  # [M,128], x̄ in lanes 0:3

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd_call(config_key, tile: int, out_pad: int, W_pad: int,
                    weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    n_flat = len(weight_shapes)
    kernel = _make_bwd_kernel(D, skips, use_siren, n_flat)

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full_block((8, 128)),
        full_block((128, 128)),
        full_block((1, W_pad)),
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, out_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full_block((1, W_pad)),
    ]
    # first output (xbar, [M, 128]) is M-dependent — built inside `call`
    out_shapes = [jax.ShapeDtypeStruct((1, W_pad), jnp.float32)]
    for (w_shape, b_shape) in weight_shapes:
        in_specs.append(full_block(w_shape))
        in_specs.append(full_block(b_shape))
        out_specs.append(full_block(w_shape))
        out_specs.append(full_block(b_shape))
        out_shapes.append(jax.ShapeDtypeStruct(w_shape, jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct(b_shape, jnp.float32))

    kwargs = {}
    if not interpret:
        try:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024)
        except Exception:
            pass

    def call(xpad, F, FT, gsdf, cot_sn, cot_h, ws, bs):
        M = xpad.shape[0]
        operands = [xpad, F, FT, gsdf, cot_sn, cot_h]
        for w, b in zip(ws, bs):
            operands += [w, b]
        shapes = [jax.ShapeDtypeStruct((M, 128), jnp.float32)] + out_shapes
        return pl.pallas_call(
            kernel,
            grid=(M // tile,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(shapes),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


@functools.lru_cache(maxsize=None)
def _make_op(config_key, tile: int, out_pad: int, W_pad: int, weight_shapes,
             multires: int, interpret: bool):
    """The custom-VJP op for one (architecture, tile, mode) configuration.
    Cached so the jax.custom_vjp wrapper (and its traced programs) are
    created once per config."""
    fwd_call = _build_call(config_key, tile, out_pad, W_pad, weight_shapes,
                           interpret)
    bwd_call = _build_bwd_call(config_key, tile, out_pad, W_pad,
                               weight_shapes, interpret)
    # Keep the embedding constants as NUMPY in this lru_cached closure and
    # convert per call: jnp.asarray inside a jit trace stages a device_put
    # (a tracer), and caching that tracer across traces is a leak
    # (UnexpectedTracerError on the second trace — hit on-chip in
    # bench_gradblock where the first op call happens inside jax.jit).
    F_np = build_embed_const(multires)
    FT_np = np.pad(F_np[0:3].T, ((0, 0), (0, 125)))

    def _primal(ws, bs, xpad):
        gsdf = ws[-1][:, 0:1].T  # d(sdf)/d(h_D): final projection's sdf row
        return fwd_call(xpad, jnp.asarray(F_np), jnp.asarray(FT_np), gsdf,
                        list(zip(ws, bs)))

    @jax.custom_vjp
    def op(ws, bs, xpad):
        return _primal(ws, bs, xpad)

    def op_fwd(ws, bs, xpad):
        return _primal(ws, bs, xpad), (ws, bs, xpad)

    def op_bwd(res, cot):
        ws, bs, xpad = res
        cot_sn, cot_h = cot
        gsdf = ws[-1][:, 0:1].T
        outs = bwd_call(xpad, jnp.asarray(F_np), jnp.asarray(FT_np), gsdf,
                        cot_sn, cot_h, ws, bs)
        xbar, gsdfbar = outs[0], outs[1]
        wbars = list(outs[2::2])
        bbars = list(outs[3::2])
        # the nablas seed u_D = W_D[:, 0] pullback lands on the sdf column
        wbars[-1] = wbars[-1].at[:, 0].add(gsdfbar[0])
        return tuple(wbars), tuple(bbars), xbar

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_forward_with_nablas_vjp(surface, params, x, tile: int = 512,
                                  interpret: bool = None):
    """(sdf, nablas, h_geo) with full custom-VJP support — the train-path
    drop-in for ImplicitSurface.forward_with_nablas (ref base.py:265-282).
    Differentiable wrt params (through the weight-norm reparameterization)
    and x; the grad-of-grad of the eikonal loss flows through the
    hand-derived phase-3 φ'' terms."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = int(os.environ.get("NEURECON_FUSED_NABLAS_VJP_TILE", tile))
    assert surface.W_geo_feat > 0, "kernel needs the split geo-feature head"
    prefix = x.shape[:-1]
    x_flat = x.reshape(-1, 3).astype(jnp.float32)
    M = x_flat.shape[0]
    xpad = jnp.pad(x_flat, ((0, 0), (0, 125)))

    flat_weights = build_padded_weights_full(surface, params)
    ws = tuple(w for w, _ in flat_weights)
    bs = tuple(b for _, b in flat_weights)
    W_pad = _round_up(surface.W, 128)
    out_pad = ws[-1].shape[1]

    M_pad = _round_up(max(M, tile), tile)
    if M_pad != M:
        xpad = jnp.pad(xpad, ((0, M_pad - M), (0, 0)))

    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)
    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    op = _make_op(config_key, tile, out_pad, W_pad, weight_shapes,
                  surface.embed_multires, interpret)
    sn, hfull = op(ws, bs, xpad)
    sdf = sn[:M, 0].reshape(prefix)
    nablas = sn[:M, 1:4].reshape(prefix + (3,))
    h_geo = hfull[:M, 1:1 + surface.W_geo_feat].reshape(
        prefix + (surface.W_geo_feat,))
    return sdf, nablas, h_geo
