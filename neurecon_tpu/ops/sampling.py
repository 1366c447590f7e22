"""Inverse-CDF sampling along rays — batched, sort-based, TPU-friendly.

Parity targets: `sample_pdf` / `sample_cdf` (reference utils/rend_util.py:255-326,
NeRF hierarchical sampling). Math is identical; the torch `searchsorted` is
replaced with a vmapped sort-based search which XLA tiles well on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# Below this many compare ops per row, a dense [N, M] comparison matrix is
# cheaper on the TPU VPU than the sort-based search (ray workloads here have
# M, N <= a few hundred — always under this).
_COUNT_SEARCH_LIMIT = 1 << 18


def _searchsorted_count(a, v, side: str):
    """O(M·N) comparison-count search: for each v, how many a's precede it.
    Pure elementwise compare + reduce — no sort, tiles perfectly on the VPU."""
    if side == "left":
        cmp = a[..., None, :] < v[..., :, None]
    else:
        cmp = a[..., None, :] <= v[..., :, None]
    return jnp.sum(cmp, axis=-1).astype(jnp.int32)


def searchsorted(a, v, side: str = "left"):
    """Batched searchsorted: a [..., M] sorted along last axis, v [..., N].

    Returns int32 insertion indices [broadcast(batch), N]. Small rows use a
    comparison-count (no sort at all); large rows fall back to JAX's
    sort-based method (O((M+N)log(M+N)), no M×N compare matrix).
    """
    M, N = a.shape[-1], v.shape[-1]
    if M * N <= _COUNT_SEARCH_LIMIT:
        inds = _searchsorted_count(a, v, side)
        batch = jnp.broadcast_shapes(a.shape[:-1], v.shape[:-1])
        return jnp.broadcast_to(inds, batch + (N,))
    batch = jnp.broadcast_shapes(a.shape[:-1], v.shape[:-1])
    a = jnp.broadcast_to(a, batch + (M,)).reshape(-1, M)
    v = jnp.broadcast_to(v, batch + (N,)).reshape(-1, N)
    inds = jax.vmap(
        lambda a_, v_: jnp.searchsorted(a_, v_, side=side, method="sort")
    )(a, v)
    return inds.reshape(batch + (N,)).astype(jnp.int32)


def merge_sorted(d_a, d_b, extras_a=(), extras_b=()):
    """Merge two per-row sorted sequences without a sort.

    d_a [..., M], d_b [..., N] each sorted along the last axis; returns
    (d [..., M+N], extras [..., M+N] ...) — the same result as
    `sort(concat([d_a, d_b]))` with co-sorted extras, but via comparison-count
    ranks + gathers (ties keep a-elements first, i.e. a stable merge).

    extras_a / extras_b: matching lists of arrays shaped like d_a / d_b whose
    values ride along with their d (e.g. the sdf sampled at those depths).
    """
    M, N = d_a.shape[-1], d_b.shape[-1]
    S = M + N
    # merged position of every element: own index + #foreign elements before it
    pos_a = jnp.arange(M, dtype=jnp.int32) + _searchsorted_count(d_b, d_a, "left")
    pos_b = jnp.arange(N, dtype=jnp.int32) + _searchsorted_count(d_a, d_b, "right")
    # pos_a / pos_b are strictly increasing and partition 0..S-1; invert by
    # counting: for output slot s, the candidate a-index is (#pos_a <= s) - 1,
    # and the slot is a's iff that candidate sits exactly at s.
    slots = jnp.arange(S, dtype=jnp.int32)
    ia = _searchsorted_count(pos_a, slots, "right") - 1  # [..., S]
    ib = _searchsorted_count(pos_b, slots, "right") - 1
    ia_c = jnp.clip(ia, 0, M - 1)
    ib_c = jnp.clip(ib, 0, N - 1)
    from_a = jnp.take_along_axis(pos_a, ia_c, axis=-1) == slots

    def pick(va, vb):
        va = jnp.broadcast_to(va, from_a.shape[:-1] + (M,))
        vb = jnp.broadcast_to(vb, from_a.shape[:-1] + (N,))
        return jnp.where(from_a,
                         jnp.take_along_axis(va, ia_c, axis=-1),
                         jnp.take_along_axis(vb, ib_c, axis=-1))

    if len(extras_a) != len(extras_b):
        raise ValueError(
            f"merge_sorted: extras_a/extras_b must pair up 1:1, got "
            f"{len(extras_a)} vs {len(extras_b)}")
    merged = [pick(d_a, d_b)]
    for ea, eb in zip(extras_a, extras_b):
        merged.append(pick(ea, eb))
    return merged[0] if not extras_a else tuple(merged)


def _uniform_u(key, batch_shape, N_importance: int, det: bool,
               sort_u: bool = False):
    if det:
        u = jnp.linspace(0.0, 1.0, N_importance)
        return jnp.broadcast_to(u, batch_shape + (N_importance,))
    u = jax.random.uniform(key, batch_shape + (N_importance,))
    # sorting u (a tiny per-row sort) makes the inverse-CDF output sorted —
    # same sample SET, lets callers merge instead of re-sorting wide buffers
    return jnp.sort(u, axis=-1) if sort_u else u


def _invert_cdf(bins, cdf, u, eps: float):
    """Shared inverse-CDF lerp. bins [..., M], cdf [..., M] (leading 0 already
    prepended by callers), u [..., N]."""
    inds = searchsorted(cdf, u, side="left")
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def sample_pdf(key, bins, weights, N_importance: int, det: bool = False,
               eps: float = 1e-5, sorted_samples: bool = False):
    """NeRF hierarchical sampling: draw N_importance depths ∝ per-bin weights.

    bins: [..., M] sorted depths; weights: [..., M-1] (one per interval).
    `key` may be None when det=True. sorted_samples=True returns the samples
    in ascending order (free when det; a tiny per-row u-sort otherwise).
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M]
    batch = jnp.broadcast_shapes(bins.shape[:-1], cdf.shape[:-1])
    u = _uniform_u(key, batch, N_importance, det, sort_u=sorted_samples)
    bins = jnp.broadcast_to(bins, batch + bins.shape[-1:])
    return _invert_cdf(bins, cdf, u, eps)


def sample_cdf(key, bins, cdf, N_importance: int, det: bool = False,
               eps: float = 1e-5, sorted_samples: bool = False):
    """Like sample_pdf but takes an (unnormalized, monotone) CDF over the
    first M-1 bins directly — used by VolSDF's opacity inversion."""
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    batch = jnp.broadcast_shapes(bins.shape[:-1], cdf.shape[:-1])
    u = _uniform_u(key, batch, N_importance, det, sort_u=sorted_samples)
    bins = jnp.broadcast_to(bins, batch + bins.shape[-1:])
    return _invert_cdf(bins, cdf, u, eps)
