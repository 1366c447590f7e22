"""Ray casting: vectorized root-finding (sign-change scan + secant), sphere
tracing, and the fast surface renderer.

Parity targets (/root/reference/models/ray_casting.py):
  * root_finding_surface_points: coarse march N_steps, sign-change detection
    via the sign/cost-matrix argmin trick, 8 secant iterations (:35-160)
  * sphere_tracing_surface_points: 20 fixed iterations with freeze mask (:163-184)
  * surface_render: cast + single radiance query, ~100x faster than volume
    rendering at eval (:187-263)

TPU-first: the reference runs the secant only on the boolean-masked subset of
rays; here every fixed-trip iteration runs on ALL rays with where-masked
updates — lanes for non-hit rays are wasted but shapes stay static and the
whole caster compiles into the calling program. Outputs are stop_gradient'd
(reference wraps everything in torch.no_grad, :59).
"""
from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp


def run_secant(f_low, f_high, d_low, d_high, rays_o, rays_d,
               query_fn: Callable, n_steps: int, logit_tau: float):
    """Fixed n_steps secant iterations, vectorized over all rays.

    f_low < 0 < f_high by construction on valid rays; the division is guarded
    so invalid lanes produce finite garbage that callers mask away.
    """
    def secant_step(f_low, f_high, d_low, d_high):
        denom = f_high - f_low
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        return -f_low * (d_high - d_low) / denom + d_low

    d_pred = secant_step(f_low, f_high, d_low, d_high)
    for _ in range(n_steps):
        p_mid = rays_o + d_pred[..., None] * rays_d
        f_mid = query_fn(p_mid) - logit_tau
        ind_low = f_mid < 0
        d_low = jnp.where(ind_low, d_pred, d_low)
        f_low = jnp.where(ind_low, f_mid, f_low)
        d_high = jnp.where(ind_low, d_high, d_pred)
        f_high = jnp.where(ind_low, f_high, f_mid)
        d_pred = secant_step(f_low, f_high, d_low, d_high)
    return d_pred


def root_finding_surface_points(
        surface_query_fn: Callable,
        rays_o: jnp.ndarray, rays_d: jnp.ndarray,
        near: Union[float, jnp.ndarray] = 0.0,
        far: Union[float, jnp.ndarray] = 6.0,
        N_steps: int = 256,
        logit_tau: float = 0.0,
        method: str = "secant",
        N_secant_steps: int = 8,
        fill_inf: bool = True):
    """Find the first + -> - crossing of (surface_query - logit_tau) per ray.

    rays_o/rays_d: [..., 3] (rays_d normalized); near/far scalar or [...].
    Returns (d_pred_out [...], pt_pred [..., 3], mask [...], mask_sign_change [...]).
    Misses get far (or +inf when fill_inf); occupied-at-start rays get 0.
    """
    prefix = rays_o.shape[:-1]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), prefix)
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), prefix)

    t = jnp.linspace(0.0, 1.0, N_steps)
    d_proposal = near[..., None] * (1 - t) + far[..., None] * t  # [..., S]
    p_proposal = rays_o[..., None, :] + d_proposal[..., :, None] * rays_d[..., None, :]

    val = surface_query_fn(p_proposal) - logit_tau  # [..., S]
    mask_0_not_occupied = val[..., 0] > 0

    # cost-matrix argmin: first sign change wins (earlier indices get larger
    # magnitude), negative cost iff a sign change exists
    sign_matrix = jnp.concatenate(
        [jnp.sign(val[..., :-1] * val[..., 1:]),
         jnp.ones(prefix + (1,))], axis=-1)
    cost_matrix = sign_matrix * jnp.arange(N_steps, 0, -1, dtype=jnp.float32)
    values = jnp.min(cost_matrix, axis=-1)
    indices = jnp.argmin(cost_matrix, axis=-1)

    mask_sign_change = values < 0
    mask_pos_to_neg = jnp.take_along_axis(val, indices[..., None], axis=-1)[..., 0] > 0
    mask = mask_sign_change & mask_pos_to_neg & mask_0_not_occupied

    d_high = jnp.take_along_axis(d_proposal, indices[..., None], axis=-1)[..., 0]
    f_high = jnp.take_along_axis(val, indices[..., None], axis=-1)[..., 0]
    ind1 = jnp.minimum(indices + 1, N_steps - 1)
    d_low = jnp.take_along_axis(d_proposal, ind1[..., None], axis=-1)[..., 0]
    f_low = jnp.take_along_axis(val, ind1[..., None], axis=-1)[..., 0]

    if method == "secant":
        d_pred = run_secant(f_low, f_high, d_low, d_high, rays_o, rays_d,
                            surface_query_fn, N_secant_steps, logit_tau)
    else:
        d_pred = jnp.ones(prefix)

    pt_pred = jnp.where(mask[..., None],
                        rays_o + d_pred[..., None] * rays_d,
                        jnp.ones(prefix + (3,)))
    miss_val = jnp.full(prefix, jnp.inf) if fill_inf else far
    d_pred_out = jnp.where(mask, d_pred, miss_val)
    d_pred_out = jnp.where(mask_0_not_occupied, d_pred_out, 0.0)

    sg = jax.lax.stop_gradient
    return sg(d_pred_out), sg(pt_pred), mask, mask_sign_change


def sphere_tracing_surface_points(
        surface_query_fn: Callable,
        rays_o: jnp.ndarray, rays_d: jnp.ndarray,
        near: float = 0.0, far: float = 6.0,
        N_iters: int = 20):
    """Fixed-iteration sphere tracing: d += sdf(o + d·dir), frozen out-of-range.

    Returns (d_preds [...], pts [..., 3], mask [...]) — mask True where the
    march stayed within [0, far].
    """
    prefix = rays_o.shape[:-1]
    d_preds = jnp.full(prefix, near, jnp.float32)
    mask = jnp.ones(prefix, bool)

    def body(carry, _):
        d_preds, mask = carry
        pts = rays_o + rays_d * d_preds[..., None]
        surface_val = surface_query_fn(pts)
        d_preds = jnp.where(mask, d_preds + surface_val, d_preds)
        mask = mask & (d_preds <= far) & (d_preds >= 0)
        return (d_preds, mask), None

    (d_preds, mask), _ = jax.lax.scan(body, (d_preds, mask), None, length=N_iters)
    pts = rays_o + rays_d * d_preds[..., None]
    sg = jax.lax.stop_gradient
    return sg(d_preds), sg(pts), mask


def make_surface_render_fn(model, ray_casting_algo: str = "sphere_tracing",
                           ray_casting_cfgs: dict = None,
                           use_view_dirs: bool = True,
                           calc_normal: bool = True):
    """Fast eval-time renderer: cast to the surface, query radiance ONCE at the
    hit point (ref ray_casting.py:187-263). Signature matches the volume
    render fns: (params, rays_o, rays_d, key) -> (rgb, depth, extras)."""
    cfgs = dict(ray_casting_cfgs or {})

    def render(params, rays_o, rays_d, key=None):
        prefix = rays_o.shape[:-1]
        rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
        rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        view_dirs = rays_d if use_view_dirs else None

        def query(x):
            # casting is gradient-free: take the fused-kernel path when the
            # framework provides one (all three do)
            fast = getattr(model, "forward_surface_fast", None)
            return (fast or model.forward_surface)(params, x)

        if ray_casting_algo == "root_finding":
            d_pred, pt_pred, mask, _ = root_finding_surface_points(
                query, rays_o, rays_d, **cfgs)
        elif ray_casting_algo == "sphere_tracing":
            d_pred, pt_pred, mask = sphere_tracing_surface_points(
                query, rays_o, rays_d, **cfgs)
        else:
            raise NotImplementedError(ray_casting_algo)

        color, _, nablas = model.forward(params, pt_pred, view_dirs)
        color = jnp.where(mask[..., None], color, 0.0)  # black background

        extras = {"implicit_nablas": nablas, "mask_surface": mask}
        if calc_normal:
            normals = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True) + 1e-10)
            extras["normals_surface"] = jnp.where(mask[..., None], normals, 0.0)

        sg = jax.lax.stop_gradient
        color, d_pred = sg(color), sg(d_pred)
        extras = jax.tree_util.tree_map(sg, extras)
        color = color.reshape(prefix + (3,))
        d_pred = d_pred.reshape(prefix)
        extras = {k: v.reshape(prefix + v.shape[1:]) for k, v in extras.items()}
        return color, d_pred, extras

    # surface rendering is deterministic and touches only the surface +
    # radiance nets: callers (render_full_image) must neither thread an RNG
    # key nor pass unused param subtrees (e.g. ln_s) into the jitted program —
    # unused parameters on this program class crash this environment's AOT
    # compiler (SIGILL). param_filter is applied OUTSIDE jit by callers.
    render.uses_key = False
    render.param_filter = lambda p: {
        "implicit_surface": p["implicit_surface"],
        "radiance_net": p["radiance_net"],
    }
    return render
