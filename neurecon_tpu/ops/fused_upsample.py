"""Fused NeuS hierarchical upsampler — one Pallas TPU megakernel.

Motivation (docs/performance.md): the flagship step's op profile is FLAT —
~200 sub-millisecond fusions from the sampler machinery — so the remaining
single-chip headroom is structural fusion, not faster ops. This kernel runs
the ENTIRE `official_solution` upsampler (ref neus.py:203-279) for a tile of
rays without leaving VMEM: coarse SDF query, then N_upsample_iters rounds of
{section-estimate -> alpha -> visibility weights -> inverse-CDF resampling ->
SDF re-query -> sorted merge}, with the MLP weights resident across grid
steps. The XLA path dispatches ~10 fusion chains per round and round-trips
every intermediate through HBM; here the only HBM traffic is rays in,
depths out, and one weight fetch.

TPU-native design notes:
  * Positional encoding is computed as `phase = A + d * G` per frequency
    column (A = <o, F_col>, G = <d_ray, F_col>) followed by one `sin` and a
    column select — no lane-granularity concatenation in VMEM.
  * `cumsum`/`cumprod` become triangular matmuls on the MXU (cumprod in log
    space; the operands are strictly positive by construction).
  * `searchsorted`, gathers, and the sorted merge use comparison-count /
    one-hot select tensors ([T, n, B] elementwise + lane reductions) — the
    same trick as `ops.sampling.searchsorted`, which the VPU tiles well; no
    sort or gather primitive is needed inside the kernel.
  * The stable merge computes each element's merged position as
    own-index + (# foreign elements before it), exactly reproducing
    concat+stable-argsort ties (old samples before new at equal depth).

Sampling semantics match `neus_upsample` + `ops.sampling.sample_pdf`: the
caller passes per-round uniforms drawn with the same key-split sequence
(sorted within each round, which changes sample order but not the sample
set — the merged output is sorted either way). Gradient-free by
construction (it only ever sees stop_gradient'ed params).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fused_mlp import apply_layer_chain, build_padded_weights, _round_up


def fused_upsample_enabled() -> bool:
    """Opt-in production gate: NEURECON_FUSED_UPSAMPLE=1 on a real TPU.
    The value "interpret" enables it on any backend (interpreter-mode
    kernel) so CPU tests can drive the full train step through it."""
    val = os.environ.get("NEURECON_FUSED_UPSAMPLE", "0")
    if val == "interpret":
        return True
    if val != "1":
        return False
    return jax.default_backend() == "tpu"


def build_embed_const(multires: int) -> np.ndarray:
    """[8, 128] constant block driving the in-kernel positional encoding.

    Rows 0-2: per-input-coordinate frequency columns F[c, j] such that
    phase[., j] = sum_c x[c] * F[c, j]; row 3: phase shift (pi/2 turns sin
    into cos); row 4: identity-column mask (emb = phase, not sin(phase)).
    Column order matches models.base.Embedder: [x, then per-frequency
    (sin(f x), cos(f x))], zero-padded to 128 lanes.
    """
    F = np.zeros((8, 128), np.float32)
    for c in range(3):
        F[c, c] = 1.0
        F[4, c] = 1.0
    if multires >= 0:
        freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
        col = 3
        for f in freqs:
            for trig in range(2):  # 0: sin, 1: cos
                for c in range(3):
                    F[c, col] = f
                    if trig == 1:
                        F[3, col] = np.pi / 2.0
                    col += 1
        assert col <= 128, "embedding wider than one lane block"
    return F


def _strict_lower(rows: int, cols: int):
    """[rows, cols] f32 matrix M[j, s] = 1 if j < s (strict prefix-sum)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (j < s).astype(jnp.float32)


def make_point_query(rec, F, wb, D: int, skips, use_siren: bool):
    """In-kernel closure: depths [T, B] -> sdf [T, B] along the tile's rays.

    rec: [T, 128] ray records (o in lanes 0:3, d in 3:6); F: [8, 128] embed
    constant (build_embed_const); wb: loaded (w_t, b) values. Shared by the
    NeuS-upsampler and VolSDF-fine-sample megakernels.
    """
    A = (rec[:, 0:1] * F[0:1] + rec[:, 1:2] * F[1:2]
         + rec[:, 2:3] * F[2:3] + F[3:4])           # [T, 128] o-phase+shift
    G = (rec[:, 3:4] * F[0:1] + rec[:, 4:5] * F[1:2]
         + rec[:, 5:6] * F[2:3])                    # [T, 128] d-phase
    idmask = F[4:5] > 0.5                           # [1, 128]

    def q_sdf(dv):
        T, B = dv.shape
        ph = A[:, None, :] + dv[:, :, None] * G[:, None, :]
        emb = jnp.where(idmask[None], ph, jnp.sin(ph))
        pre = apply_layer_chain(emb.reshape(T * B, 128), wb,
                                D, skips, use_siren)
        pre3 = pre.reshape(T, B, 128)
        # lane-0 (sdf) extraction as a masked lane-reduce, which maps to
        # a native cross-lane reduction instead of a squeeze relayout
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) == 0
        return jnp.sum(jnp.where(lane0, pre3, 0.0), axis=-1)

    return q_sdf


def _cumsum_lanes(x, strict: bool):
    """Chunked cumulative sum along lanes via [<=128, <=128] triangular
    matmuls with a running carry — bounded constants for any row width
    (a full [L, L] triangular constant would not fit VMEM at L ~ 3k)."""
    T, L = x.shape
    BL = 128
    outs = []
    carry = jnp.zeros((T, 1), jnp.float32)
    for s in range(0, L, BL):
        blk = x[:, s:min(s + BL, L)]
        w = blk.shape[1]
        i = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        M = ((i < j) if strict else (i <= j)).astype(jnp.float32)
        outs.append(jnp.dot(blk, M, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    + carry)
        carry = carry + jnp.sum(blk, axis=-1, keepdims=True)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _shift_lanes(x, shift: int = 1, out_width: int | None = None):
    """out[:, j] = x[:, j - shift] (zero where out of range), as lane-chunked
    shift matmuls. Mosaic-safe replacement for the shift-by-concat idiom
    (`concat([zeros[:, :1], x[:, :-1]])`), which real Mosaic rejects with
    "result/input offset mismatch on non-concat dimension" — the width-1
    and width-(W-1) slice operands carry incompatible vreg offsets. A matmul
    result always has a canonical {0,0} layout, so per-128-lane-chunk shift
    matmuls concat cleanly. `out_width=W+1` gives the prepend-zero form.
    """
    T, W = x.shape
    OW = W if out_width is None else out_width
    BL = 128
    outs = []
    for s0 in range(0, OW, BL):
        w = min(BL, OW - s0)
        lo = max(s0 - shift, 0) if shift >= 0 else s0 - shift
        hi = min(s0 + w - shift, W)
        lo = min(lo, W)
        hi = max(hi, lo)
        seg = x[:, lo:hi]
        m = hi - lo
        if m == 0:
            outs.append(jnp.zeros((T, w), jnp.float32))
            continue
        ii = jax.lax.broadcasted_iota(jnp.int32, (m, w), 0) + lo
        jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1) + s0
        M = (jj == ii + shift).astype(jnp.float32)
        outs.append(jnp.dot(seg.astype(jnp.float32), M,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def invert_cdf_counting(bins, cdf, u, eps: float = 1e-5,
                        lane_chunk: int = 128):
    """ops.sampling._invert_cdf with comparison-count search + one-hot
    gathers (no gather primitive inside a kernel). bins/cdf [T, S], u [T, n].

    All reductions over S run in `lane_chunk`-wide pieces: the peak 3D
    temporary is [T, n, lane_chunk] instead of [T, n, S]. At the VolSDF
    megakernel's widths (n=130, S growing to 640) the unchunked form made
    Mosaic's register allocator spill >160 MB of vregs to VMEM stack (the
    per-chunk temporaries die fast, so chunked slots get reused).
    """
    T, S = bins.shape
    n = u.shape[1]
    inds = jnp.zeros((T, n), jnp.int32)
    for s0 in range(0, S, lane_chunk):
        c = cdf[:, s0:min(s0 + lane_chunk, S)]
        inds = inds + jnp.sum(
            (c[:, None, :] < u[:, :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, S - 1)
    cdf_b = jnp.zeros((T, n), jnp.float32)
    cdf_a = jnp.zeros((T, n), jnp.float32)
    bins_b = jnp.zeros((T, n), jnp.float32)
    bins_a = jnp.zeros((T, n), jnp.float32)
    for s0 in range(0, S, lane_chunk):
        w = min(lane_chunk, S - s0)
        bidx = jax.lax.broadcasted_iota(jnp.int32, (T, n, w), 2) + s0
        ohb = bidx == below[:, :, None]
        oha = bidx == above[:, :, None]
        # slice BEFORE adding the axis: x[:, None, s0:s0+w] traces to a
        # gather primitive, which Mosaic has no lowering for
        cdf3 = cdf[:, s0:s0 + w][:, None, :]
        bins3 = bins[:, s0:s0 + w][:, None, :]
        cdf_b = cdf_b + jnp.sum(jnp.where(ohb, cdf3, 0.0), axis=-1)
        cdf_a = cdf_a + jnp.sum(jnp.where(oha, cdf3, 0.0), axis=-1)
        bins_b = bins_b + jnp.sum(jnp.where(ohb, bins3, 0.0), axis=-1)
        bins_a = bins_a + jnp.sum(jnp.where(oha, bins3, 0.0), axis=-1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)


def merge_sorted_counting(d_a, d_b, extras_a=(), extras_b=(),
                          lane_chunk: int = 128):
    """Stable sorted merge (a before b at ties) via counting positions and
    lane-chunked one-hot scatters — the in-kernel replacement for
    concat+argsort+gather. d_a [T, B] and d_b [T, n] each sorted; extras ride
    along. Peak temporary is [T, B, lane_chunk] regardless of output width.
    """
    T, B = d_a.shape
    n = d_b.shape[1]
    S2 = B + n

    # position counts, reduced in lane_chunk pieces over the other operand
    # (peak temporary [T, lane_chunk, lane_chunk] — see invert_cdf_counting
    # for why: unchunked [T, B, n] comparisons spill vregs at VolSDF widths)
    def _count_lt(q, keys, strict):
        cnt = jnp.zeros(q.shape, jnp.int32)
        for k0 in range(0, keys.shape[1], lane_chunk):
            kc = keys[:, k0:min(k0 + lane_chunk, keys.shape[1])]
            cmp = (kc[:, None, :] < q[:, :, None] if strict
                   else kc[:, None, :] <= q[:, :, None])
            cnt = cnt + jnp.sum(cmp.astype(jnp.int32), axis=-1)
        return cnt

    pos_a = (jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
             + _count_lt(d_a, d_b, strict=True))
    pos_b = (jax.lax.broadcasted_iota(jnp.int32, (T, n), 1)
             + _count_lt(d_b, d_a, strict=False))
    vals_a = (d_a,) + tuple(extras_a)
    vals_b = (d_b,) + tuple(extras_b)
    out_blocks = [[] for _ in vals_a]
    for s0 in range(0, S2, lane_chunk):
        w = min(lane_chunk, S2 - s0)
        blks = [jnp.zeros((T, w), jnp.float32) for _ in vals_a]
        for b0 in range(0, B, lane_chunk):
            bw = min(lane_chunk, B - b0)
            sA = jax.lax.broadcasted_iota(jnp.int32, (T, bw, w), 2) + s0
            ohA = pos_a[:, b0:b0 + bw][:, :, None] == sA
            for oi, va in enumerate(vals_a):
                blks[oi] = blks[oi] + jnp.sum(
                    jnp.where(ohA, va[:, b0:b0 + bw][:, :, None], 0.0),
                    axis=1)
        for b0 in range(0, n, lane_chunk):
            bw = min(lane_chunk, n - b0)
            sB = jax.lax.broadcasted_iota(jnp.int32, (T, bw, w), 2) + s0
            ohB = pos_b[:, b0:b0 + bw][:, :, None] == sB
            for oi, vb in enumerate(vals_b):
                blks[oi] = blks[oi] + jnp.sum(
                    jnp.where(ohB, vb[:, b0:b0 + bw][:, :, None], 0.0),
                    axis=1)
        for oi, blk in enumerate(blks):
            out_blocks[oi].append(blk)
    merged = [b[0] if len(b) == 1 else jnp.concatenate(b, axis=-1)
              for b in out_blocks]
    return merged[0] if not extras_a else tuple(merged)


def _make_upsample_kernel(D: int, skips: tuple, use_siren: bool,
                          n_iters: int, n_per_iter: int):
    def kernel(rec_ref, dc_ref, u_ref, F_ref, *refs):
        out_ref = refs[-1]
        wb = [r[:] for r in refs[:-1]]
        q_sdf = make_point_query(rec_ref[:], F_ref[:], wb, D, skips,
                                 use_siren)

        _d = dc_ref[:]                        # [T, Bc]
        _sdf = q_sdf(_d)
        for i in range(n_iters):
            B = _d.shape[1]
            prev_sdf, next_sdf = _sdf[:, :-1], _sdf[:, 1:]
            prev_z, next_z = _d[:, :-1], _d[:, 1:]
            mid_sdf = 0.5 * (prev_sdf + next_sdf)
            dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
            prev_dot = _shift_lanes(dot_val)
            dot_val = jnp.clip(jnp.minimum(prev_dot, dot_val), -10.0, 0.0)
            dist = next_z - prev_z
            prev_esti = mid_sdf - dot_val * dist * 0.5
            next_esti = mid_sdf + dot_val * dist * 0.5
            s = 64.0 * (2.0 ** i)
            pc = jax.nn.sigmoid(prev_esti * s)
            nc = jax.nn.sigmoid(next_esti * s)
            alpha = (pc - nc + 1e-5) / (pc + 1e-5)      # [T, B-1], <= 1
            # alpha_to_w: w_i = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10),
            # cumprod as a strict-lower-triangular matmul in log space.
            # alpha <= 1 structurally (nc <= pc by sigmoid monotonicity), so
            # 1 - alpha >= 0 — but XLA's algebraic rewrites of the fused
            # alpha expression can push it a hair past 1 and NaN the log
            # (observed on CPU: fusion-only NaNs, deoptimized path clean),
            # hence the max(0) guard and the <=0 clamp on the cumsum.
            lg = jnp.log(jnp.maximum(1.0 - alpha, 0.0) + 1e-10)
            csum = jnp.minimum(
                jnp.dot(lg, _strict_lower(B - 1, B - 1),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), 0.0)
            w = alpha * jnp.exp(csum)
            # sample_pdf (det path with caller-provided sorted u)
            w5 = w + 1e-5
            pdf = w5 / jnp.sum(w5, axis=-1, keepdims=True)
            cdf = jnp.dot(pdf, _strict_lower(B - 1, B),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [T, B], cdf[:,0]=0
            n = n_per_iter
            u = u_ref[:, i * n:(i + 1) * n]                    # [T, n]
            d_fine = invert_cdf_counting(_d, cdf, u)
            sdf_fine = q_sdf(d_fine)
            _d, _sdf = merge_sorted_counting(_d, d_fine,
                                             extras_a=(_sdf,),
                                             extras_b=(sdf_fine,))
        out_ref[:] = _d

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(config_key, tile: int, n_coarse: int, n_iters: int,
                n_per_iter: int, weight_shapes, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, skips, use_siren = config_key
    kernel = _make_upsample_kernel(D, skips, use_siren, n_iters, n_per_iter)
    n_u = n_iters * n_per_iter
    S_out = n_coarse + n_u

    def full_block(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, n_coarse), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
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

    def call(rec, d_coarse, u_rounds, F, flat_weights):
        N = rec.shape[0]
        operands = [rec, d_coarse, u_rounds, F]
        for (w, b) in flat_weights:
            operands += [w, b]
        return pl.pallas_call(
            kernel,
            grid=(N // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, S_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, S_out), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(*operands)

    return call


def fused_neus_upsample(surface, params, rays_o, rays_d, d_coarse, u_rounds,
                        *, n_iters: int, n_per_iter: int, tile: int = 32,
                        interpret: bool = None):
    """d_all = fused upsampler(rays, d_coarse, u): drop-in for the
    official_solution loop in `neus_upsample` (same inputs modulo the
    pre-drawn per-round uniforms).

    rays_o/rays_d: [N, 3] (d normalized); d_coarse: [N, Bc] sorted;
    u_rounds: [N, n_iters * n_per_iter], each round's slice ascending.
    Returns sorted d_all [N, Bc + n_iters * n_per_iter].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, n_coarse = d_coarse.shape
    rec = jnp.pad(
        jnp.concatenate([rays_o, rays_d], axis=-1).astype(jnp.float32),
        ((0, 0), (0, 122)))
    F = jnp.asarray(build_embed_const(surface.embed_multires))
    flat_weights = build_padded_weights(surface, params)
    weight_shapes = tuple((tuple(w.shape), tuple(b.shape))
                          for (w, b) in flat_weights)

    N_pad = _round_up(max(N, tile), tile)
    if N_pad != N:
        pad = ((0, N_pad - N), (0, 0))
        rec = jnp.pad(rec, pad)
        # padded rays get d=0 -> constant points; keep depths sane/sorted
        d_coarse = jnp.pad(d_coarse, pad, mode="edge")
        u_rounds = jnp.pad(u_rounds, pad, mode="edge")

    config_key = (surface.D, tuple(surface.skips), surface.use_siren)
    call = _build_call(config_key, tile, n_coarse, n_iters, n_per_iter,
                       weight_shapes, interpret)
    d_all = call(rec, d_coarse.astype(jnp.float32),
                 u_rounds.astype(jnp.float32), F, flat_weights)
    return d_all[:N]
