"""Inverse-CDF sampling along rays — batched, sort-based, TPU-friendly.

Parity targets: `sample_pdf` / `sample_cdf` (reference utils/rend_util.py:255-326,
NeRF hierarchical sampling). Math is identical; the torch `searchsorted` is
replaced with a vmapped sort-based search which XLA tiles well on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted(a, v, side: str = "left"):
    """Batched searchsorted: a [..., M] sorted along last axis, v [..., N].

    Returns int32 insertion indices [broadcast(batch), N]. Uses JAX's
    sort-based method per batch row (O((M+N)log(M+N)), no M×N compare matrix).
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], v.shape[:-1])
    M, N = a.shape[-1], v.shape[-1]
    a = jnp.broadcast_to(a, batch + (M,)).reshape(-1, M)
    v = jnp.broadcast_to(v, batch + (N,)).reshape(-1, N)
    inds = jax.vmap(
        lambda a_, v_: jnp.searchsorted(a_, v_, side=side, method="sort")
    )(a, v)
    return inds.reshape(batch + (N,)).astype(jnp.int32)


def _uniform_u(key, batch_shape, N_importance: int, det: bool):
    if det:
        u = jnp.linspace(0.0, 1.0, N_importance)
        return jnp.broadcast_to(u, batch_shape + (N_importance,))
    return jax.random.uniform(key, batch_shape + (N_importance,))


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
               eps: float = 1e-5):
    """NeRF hierarchical sampling: draw N_importance depths ∝ per-bin weights.

    bins: [..., M] sorted depths; weights: [..., M-1] (one per interval).
    `key` may be None when det=True.
    """
    weights = weights + 1e-5  # prevent nans
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M]
    batch = jnp.broadcast_shapes(bins.shape[:-1], cdf.shape[:-1])
    u = _uniform_u(key, batch, N_importance, det)
    bins = jnp.broadcast_to(bins, batch + bins.shape[-1:])
    return _invert_cdf(bins, cdf, u, eps)


def sample_cdf(key, bins, cdf, N_importance: int, det: bool = False,
               eps: float = 1e-5):
    """Like sample_pdf but takes an (unnormalized, monotone) CDF over the
    first M-1 bins directly — used by VolSDF's opacity inversion."""
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    batch = jnp.broadcast_shapes(bins.shape[:-1], cdf.shape[:-1])
    u = _uniform_u(key, batch, N_importance, det)
    bins = jnp.broadcast_to(bins, batch + bins.shape[-1:])
    return _invert_cdf(bins, cdf, u, eps)
