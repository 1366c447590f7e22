"""VolSDF (Laplace-CDF sdf→σ with error-bounded up-sampling) — TPU-native.

Parity targets in the reference (/root/reference/models/frameworks/volsdf.py):
  * sdf_to_sigma: σ = α·Ψ_β(-sdf), Laplace CDF          (volsdf.py:16-35)
  * error_bound: per-interval opacity error bound        (volsdf.py:38-74)
  * fine_sample: §3.4 adaptive sampling w/ β bisection    (volsdf.py:77-272)
  * learnable ln_beta, speed_factor                       (volsdf.py:289-308)
  * builtin sphere background min(sdf, r-|x|)             (volsdf.py:310-325)
  * coarse∪fine compositor p_i/τ_i                        (volsdf.py:334-551)
  * Trainer: L1 + eikonal on (max-weight surface point ⊕
    uniform box point) per ray                            (volsdf.py:572-644)

TPU-first: the reference's data-dependent per-ray bookkeeping (boolean
indexing, ragged masked updates, dynamic sample counts) becomes a fixed-trip
unrolled loop over max_iter with per-ray convergence masks — converged rays
keep computing in wasted lanes (cheap on TPU) while `jnp.where` freezes their
outputs; the β bisection is a fixed `max_bisection`-step vectorized loop over
ALL rays. Buffers grow statically: N_init + it*N_up. No host sync anywhere.
"""
from __future__ import annotations

import copy
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.base import NeRF, ImplicitSurface, RadianceNet
from neurecon_tpu.ops import (
    get_dvals_from_radius,
    get_sphere_intersection,
    sample_cdf,
    sample_pdf,
)
from neurecon_tpu.ops.fused_fine_sample import fused_fine_sample_enabled


def sdf_to_sigma(sdf, alpha, beta):
    """§3.1: scaled Laplace CDF of -sdf. Works with any shape prefix."""
    exp = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    psi = jnp.where(sdf >= 0, exp, 1 - exp)
    return alpha * psi


def error_bound(d_vals, sdf, alpha, beta):
    """§3.3: the opacity-approximation error bound of a sampling.

    d_vals, sdf: [..., P] -> bounds [..., P-1]. NaNs (from 0·inf) are replaced
    with +inf, matching the reference fixup (volsdf.py:73).
    """
    sigma = sdf_to_sigma(sdf, alpha, beta)
    sdf_abs = jnp.abs(sdf)
    delta_i = d_vals[..., 1:] - d_vals[..., :-1]
    # R(t_k) at the interval starts
    R_t = jnp.concatenate(
        [jnp.zeros_like(sdf[..., :1]),
         jnp.cumsum(sigma[..., :-1] * delta_i, axis=-1)], axis=-1)[..., :-1]
    d_i_star = jnp.maximum(
        0.5 * (sdf_abs[..., :-1] + sdf_abs[..., 1:] - delta_i), 0.0)
    errors = alpha / (4 * beta) * (delta_i ** 2) * jnp.exp(-d_i_star / beta)
    errors_t = jnp.cumsum(errors, axis=-1)
    bounds = jnp.exp(-R_t) * (jnp.exp(errors_t) - 1.0)
    return jnp.where(jnp.isnan(bounds), jnp.inf, bounds)


def _opacity_approx(d_vals, sdf, alpha, beta):
    """1 - exp(-R_t): the opacity CDF used for final inverse-CDF sampling."""
    sigma = sdf_to_sigma(sdf, alpha, beta)
    delta_i = d_vals[..., 1:] - d_vals[..., :-1]
    R_t = jnp.concatenate(
        [jnp.zeros_like(sdf[..., :1]),
         jnp.cumsum(sigma[..., :-1] * delta_i, axis=-1)], axis=-1)[..., :-1]
    return 1.0 - jnp.exp(-R_t)


def fine_sample(query_sdf_fn, init_dvals, rays_o, rays_d,
                alpha_net, beta_net, far, key,
                eps: float = 0.1, max_iter: int = 5, max_bisection: int = 10,
                final_N_importance: int = 64, N_up: int = 128,
                perturb: bool = True):
    """§3.4 error-bounded fine sampling, fully parallel over rays.

    init_dvals [..., N], rays_o/d [..., 3], far [..., 1].
    Returns (final_fine_dvals [..., final_N_importance], beta heat-map [...],
    iter_usage [...] with -1 for never-converged).
    """
    prefix = init_dvals.shape[:-1]

    def query(d):
        pts = rays_o[..., None, :] + rays_d[..., None, :] * d[..., :, None]
        return query_sdf_fn(pts)

    def invert_opacity(k, d, sdf, alpha_, beta_):
        opacity = _opacity_approx(d, sdf, alpha_, beta_)
        return sample_cdf(k, d, opacity, final_N_importance, det=not perturb)

    keys = jax.random.split(key, max_iter + 2)

    # init β+ s.t. the UNIFORM sampling bound == eps (paper eq. 10)
    beta = jnp.sqrt((far ** 2) / (4 * (init_dvals.shape[-1] - 1) * np.log(1 + eps)))
    alpha = 1.0 / beta

    d_vals = init_dvals
    sdf = query(d_vals)

    net_bounds_max = jnp.max(error_bound(d_vals, sdf, alpha_net, beta_net), axis=-1)
    mask = net_bounds_max > eps  # not yet converged under the net's β

    bounds = jnp.clip(error_bound(d_vals, sdf, alpha, beta), 0, 1e5)

    # rays converged from the start: freeze their final samples at iter 0
    final_fine_dvals = invert_opacity(keys[0], d_vals, sdf, alpha_net, beta_net)
    final_iter_usage = jnp.where(mask, -1, 0)
    final_converge_flag = ~mask

    for it_algo in range(1, max_iter + 1):
        # --- upsample ∝ error bound for ALL rays (converged lanes wasted) ---
        upsampled = sample_pdf(None, d_vals, bounds, N_up + 2, det=True)[..., 1:-1]
        new_sdf = query(upsampled)
        # concat+sort beats a comparison-count merge here on real TPU
        # (see neus.neus_upsample NOTE / docs/performance.md)
        d_vals = jnp.concatenate([d_vals, upsampled], axis=-1)
        sdf = jnp.concatenate([sdf, new_sdf], axis=-1)
        # one stable 2-operand sort network co-sorts (d, sdf); bitwise equal
        # to stable argsort + two take_along_axis gathers, minus the gathers
        # and the iota operand
        d_vals, sdf = jax.lax.sort((d_vals, sdf), dimension=-1,
                                   is_stable=True, num_keys=1)

        # --- re-check bound under the network's current β ---
        net_bounds_max = jnp.max(error_bound(d_vals, sdf, alpha_net, beta_net),
                                 axis=-1)
        still_bad = net_bounds_max > eps
        newly_converged = mask & ~still_bad
        cand = invert_opacity(keys[it_algo], d_vals, sdf, alpha_net, beta_net)
        final_fine_dvals = jnp.where(newly_converged[..., None], cand,
                                     final_fine_dvals)
        final_iter_usage = jnp.where(newly_converged, it_algo, final_iter_usage)
        final_converge_flag = final_converge_flag | newly_converged
        mask = mask & still_bad

        # --- bisection: find β+ s.t. bound(β+) == eps on the still-bad rays ---
        beta_right = beta
        beta_left = jnp.full_like(beta, beta_net)
        for _ in range(max_bisection):
            beta_tmp = 0.5 * (beta_left + beta_right)
            bmax = jnp.max(error_bound(d_vals, sdf, 1.0 / beta_tmp, beta_tmp),
                           axis=-1, keepdims=True)
            good = bmax <= eps
            beta_right = jnp.where(good, beta_tmp, beta_right)
            beta_left = jnp.where(good, beta_left, beta_tmp)
        beta = jnp.where(mask[..., None], beta_right, beta)
        alpha = 1.0 / beta

        bounds = jnp.clip(error_bound(d_vals, sdf, alpha, beta), 0, 1e5)

    # never-converged rays: sample with the final β+
    not_conv = ~final_converge_flag
    cand = invert_opacity(keys[-1], d_vals, sdf, alpha, beta)
    final_fine_dvals = jnp.where(not_conv[..., None], cand, final_fine_dvals)
    final_iter_usage = jnp.where(not_conv, -1, final_iter_usage)
    beta_out = jnp.where(final_converge_flag, beta_net, beta[..., 0])

    return (jax.lax.stop_gradient(final_fine_dvals),
            jax.lax.stop_gradient(beta_out),
            jax.lax.stop_gradient(final_iter_usage))


def _fine_sample_dispatch(model, sg_params, d_init, rays_o, rays_d, *,
                          alpha_net, beta_net, far, key, eps, max_iter,
                          max_bisection, final_N_importance, N_up, perturb):
    """fine_sample, or its Pallas megakernel form when the gate is on
    (ops/fused_fine_sample.py). The fused path pre-draws the per-checkpoint
    inverse-CDF uniforms with the exact reference key sequence, so the two
    paths agree elementwise (the interior upsample is det either way)."""
    if fused_fine_sample_enabled():
        from neurecon_tpu.ops.fused_fine_sample import fused_fine_sample
        keys = jax.random.split(key, max_iter + 2)
        batch = d_init.shape[:-1]
        us = []
        for i in range(max_iter + 2):
            if perturb:
                us.append(jax.random.uniform(
                    keys[i], batch + (final_N_importance,)))
            else:
                us.append(jnp.broadcast_to(
                    jnp.linspace(0.0, 1.0, final_N_importance),
                    batch + (final_N_importance,)))
        out = fused_fine_sample(
            model.implicit_surface, sg_params["implicit_surface"],
            rays_o, rays_d, d_init, far, alpha_net, beta_net,
            jnp.concatenate(us, axis=-1), eps=eps, max_iter=max_iter,
            max_bisection=max_bisection, n_final=final_N_importance,
            n_up=N_up,
            sphere_bg_r=(model.obj_bounding_radius
                         if model.use_sphere_bg else None))
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)
    return fine_sample(
        lambda x: model.forward_surface(sg_params, x), d_init, rays_o,
        rays_d, alpha_net=alpha_net, beta_net=beta_net, far=far, key=key,
        eps=eps, max_iter=max_iter, max_bisection=max_bisection,
        final_N_importance=final_N_importance, N_up=N_up, perturb=perturb)


class VolSDF:
    """Stateless VolSDF module: static config + pure init/forward functions."""

    def __init__(self,
                 beta_init: float = 0.1,
                 speed_factor: float = 1.0,
                 input_ch: int = 3,
                 W_geo_feat: int = -1,
                 obj_bounding_radius: float = 3.0,
                 use_nerfplusplus: bool = False,
                 surface_cfg: Optional[dict] = None,
                 radiance_cfg: Optional[dict] = None):
        self.speed_factor = speed_factor
        self.ln_beta_init = np.log(beta_init) / speed_factor
        self.use_sphere_bg = not use_nerfplusplus
        self.obj_bounding_radius = obj_bounding_radius

        self.implicit_surface = ImplicitSurface(
            W_geo_feat=W_geo_feat, input_ch=input_ch,
            obj_bounding_size=obj_bounding_radius, **(surface_cfg or {}))
        if W_geo_feat < 0:
            W_geo_feat = self.implicit_surface.W
        self.radiance_net = RadianceNet(W_geo_feat=W_geo_feat, **(radiance_cfg or {}))
        self.nerf_outside = (
            NeRF(input_ch=4, multires=10, multires_view=4, use_view_dirs=True)
            if use_nerfplusplus else None)

    def init(self, key: jax.Array):
        ks, kr, kn = jax.random.split(key, 3)
        params = {
            "ln_beta": jnp.asarray([self.ln_beta_init], jnp.float32),
            "implicit_surface": self.implicit_surface.init(ks),
            "radiance_net": self.radiance_net.init(kr),
        }
        if self.nerf_outside is not None:
            params["nerf_outside"] = self.nerf_outside.init(kn)
        return params

    def forward_ab(self, params):
        beta = jnp.exp(params["ln_beta"][0] * self.speed_factor)
        return 1.0 / beta, beta

    def forward_surface(self, params, x):
        sdf = self.implicit_surface.forward(params["implicit_surface"], x)
        if self.use_sphere_bg:
            return jnp.minimum(sdf,
                               self.obj_bounding_radius - jnp.linalg.norm(x, axis=-1))
        return sdf

    def forward_surface_fast(self, params, x):
        """Gradient-free sdf query (fused Pallas kernel on TPU); the sphere-bg
        min-trick is a cheap elementwise op applied outside the kernel."""
        sdf = self.implicit_surface.forward_query(params["implicit_surface"], x)
        if self.use_sphere_bg:
            return jnp.minimum(sdf,
                               self.obj_bounding_radius - jnp.linalg.norm(x, axis=-1))
        return sdf

    def forward_surface_with_nablas(self, params, x):
        sdf, nablas, h = self.implicit_surface.forward_with_nablas(
            params["implicit_surface"], x)
        if self.use_sphere_bg:
            d_bg = self.obj_bounding_radius - jnp.linalg.norm(x, axis=-1)
            # swap sdf (not nablas) where the bg sphere is closer — keeps more
            # eikonal constraints (ref volsdf.py:317-325)
            sdf = jnp.where(d_bg < sdf, d_bg, sdf)
        return sdf, nablas, h

    def forward_with_nablas(self, params, x):
        return self.implicit_surface.forward_with_nablas(params["implicit_surface"], x)

    def forward(self, params, x, view_dirs):
        sdf, nablas, geo_feat = self.forward_surface_with_nablas(params, x)
        radiances = self.radiance_net.forward(params["radiance_net"], x, view_dirs,
                                              nablas, geo_feat)
        return radiances, sdf, nablas


def _ray_bounds(rays_o, rays_d, near, far, obj_bounding_radius,
                use_nerfplusplus):
    """Flatten + normalize rays and compute per-ray [near, far] — the shared
    preamble of the renderer and the stand-alone fine sampler."""
    rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    N_rays = rays_o.shape[0]
    nears = jnp.full((N_rays, 1), near, jnp.float32)
    if use_nerfplusplus:
        _, fars, _mask = get_sphere_intersection(rays_o, rays_d,
                                                 r=obj_bounding_radius)
    else:
        fars = jnp.full((N_rays, 1), far, jnp.float32)
    return rays_o, rays_d, nears, fars


def compute_ray_samples(model: VolSDF, params, rays_o, rays_d, key,
                        *,
                        near: float = 0.0,
                        far: float = 6.0,
                        obj_bounding_radius: float = 3.0,
                        use_nerfplusplus: bool = False,
                        perturb: bool = False,
                        N_samples: int = 128,
                        N_importance: int = 64,
                        max_upsample_steps: int = 5,
                        max_bisection_steps: int = 10,
                        epsilon: float = 0.1,
                        fine_sample_mul: int = 4,
                        **dummy_kwargs):
    """Gradient-free §3.4 fine sampler, callable OUTSIDE the render. Splits
    `key` exactly like volume_render_rays, so sample + render-with-override
    under the SAME key reproduces the fused render bit for bit. Returns
    (d_fine, beta_map, iter_usage) flat over rays, for fine_override=."""
    rays_o, rays_d, nears, fars = _ray_bounds(
        rays_o, rays_d, near, far, obj_bounding_radius, use_nerfplusplus)
    key_fine, _key_out = jax.random.split(key)
    alpha, beta = model.forward_ab(params)
    sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    _t_init = jnp.linspace(0, 1, N_samples * fine_sample_mul)
    d_init = nears * (1 - _t_init) + fars * _t_init
    return _fine_sample_dispatch(
        model, sg_params, d_init, rays_o, rays_d,
        alpha_net=jax.lax.stop_gradient(alpha),
        beta_net=jax.lax.stop_gradient(beta),
        far=fars, key=key_fine, eps=epsilon, max_iter=max_upsample_steps,
        max_bisection=max_bisection_steps, final_N_importance=N_importance,
        N_up=N_samples * fine_sample_mul, perturb=perturb)


def volume_render_rays(model: VolSDF, params, rays_o, rays_d, key,
                       *,
                       near: float = 0.0,
                       far: float = 6.0,
                       obj_bounding_radius: float = 3.0,
                       use_view_dirs: bool = True,
                       white_bkgd: bool = False,
                       use_nerfplusplus: bool = False,
                       perturb: bool = False,
                       N_samples: int = 128,
                       N_importance: int = 64,
                       N_outside: int = 32,
                       max_upsample_steps: int = 5,
                       max_bisection_steps: int = 10,
                       epsilon: float = 0.1,
                       fine_sample_mul: int = 4,
                       calc_normal: bool = False,
                       detailed_output: bool = True,
                       eik_pts=None,
                       fine_override=None,
                       **dummy_kwargs):
    """Render a flat batch of rays [N, 3] -> dict of per-ray outputs.

    eik_pts [N, K, 3] (optional): extra query points whose nablas the trainer
    needs (eikonal regularization). They are appended to the renderer's single
    batched network query — a SEPARATE forward_with_nablas instance in the
    same program crashes this environment's TPU compiler — and returned as
    ret['eik_nablas'] without touching the compositor.
    """
    rays_o, rays_d, nears, fars = _ray_bounds(
        rays_o, rays_d, near, far, obj_bounding_radius, use_nerfplusplus)
    view_dirs = rays_d if use_view_dirs else None
    N_rays = rays_o.shape[0]

    key_fine, key_out = jax.random.split(key)

    _t = jnp.linspace(0, 1, N_samples)
    d_coarse = nears * (1 - _t) + fars * _t

    alpha, beta = model.forward_ab(params)
    sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    if fine_override is not None:
        # precomputed by compute_ray_samples (pipelined train step; possibly
        # one step stale — placement only, values below use fresh params)
        d_fine, beta_map, iter_usage = fine_override
        d_fine = jax.lax.stop_gradient(d_fine.reshape(N_rays, -1))
        beta_map = jax.lax.stop_gradient(beta_map.reshape(N_rays))
        iter_usage = jax.lax.stop_gradient(iter_usage.reshape(N_rays))
    else:
        # denser d_init speeds up up-sampling convergence (ref volsdf.py:425-435)
        _t_init = jnp.linspace(0, 1, N_samples * fine_sample_mul)
        d_init = nears * (1 - _t_init) + fars * _t_init
        d_fine, beta_map, iter_usage = _fine_sample_dispatch(
            model, sg_params, d_init, rays_o, rays_d,
            alpha_net=jax.lax.stop_gradient(alpha),
            beta_net=jax.lax.stop_gradient(beta),
            far=fars, key=key_fine, eps=epsilon, max_iter=max_upsample_steps,
            max_bisection=max_bisection_steps, final_N_importance=N_importance,
            N_up=N_samples * fine_sample_mul, perturb=perturb)

    # paper says fine-only, but practice needs the coarse concat to avoid
    # early local minima (ref volsdf.py:439-443)
    d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]

    P_render = pts.shape[-2]
    if eik_pts is not None:
        pts = jnp.concatenate([pts, eik_pts.reshape(N_rays, -1, 3)], axis=-2)
    views = (jnp.broadcast_to(view_dirs[..., None, :], pts.shape)
             if use_view_dirs else None)
    radiances, sdf, nablas = model.forward(params, pts, views)
    eik_nablas = None
    if eik_pts is not None:
        eik_nablas = nablas[..., P_render:, :]
        radiances = radiances[..., :P_render, :]
        sdf = sdf[..., :P_render]
        nablas = nablas[..., :P_render, :]
    sigma = sdf_to_sigma(sdf, alpha, beta)

    sigma_out = radiance_out = None
    if use_nerfplusplus:
        _t_out = jnp.linspace(0, 1, N_outside + 2)[1:-1]
        rs = obj_bounding_radius / jnp.flip(_t_out, axis=-1)
        rs = jnp.broadcast_to(rs, (N_rays, N_outside))
        if perturb:
            mids = 0.5 * (rs[..., 1:] + rs[..., :-1])
            upper = jnp.concatenate([mids, rs[..., -1:]], axis=-1)
            lower = jnp.concatenate([rs[..., :1], mids], axis=-1)
            rs = lower + (upper - lower) * jax.random.uniform(key_out, upper.shape)
        d_out = get_dvals_from_radius(rays_o, rays_d, rs)
        pts_out = rays_o[..., None, :] + rays_d[..., None, :] * d_out[..., :, None]
        x_out = jnp.concatenate([pts_out / rs[..., None], 1.0 / rs[..., None]],
                                axis=-1)
        views_out = (jnp.broadcast_to(view_dirs[..., None, :], pts_out.shape)
                     if use_view_dirs else None)
        sigma_out, radiance_out = model.nerf_outside.forward(
            params["nerf_outside"], x_out, views_out)
        d_all = jnp.concatenate([d_all, d_out], axis=-1)  # already sorted
        sigma = jnp.concatenate([sigma, sigma_out], axis=-1)
        radiances = jnp.concatenate([radiances, radiance_out], axis=-2)

    # ray integration: p_i = exp(-relu(σδ)); τ_i = (1-p_i)·cumprod(shifted p)
    delta_i = d_all[..., 1:] - d_all[..., :-1]
    p_i = jnp.exp(-jnp.maximum(sigma[..., :-1] * delta_i, 0.0))
    # max(.,0) defeats the XLA reassociation that folds `1 - x + 1e-10`
    # into `1 - x` (see neus.alpha_to_w / docs/probes)
    tau_i = (jnp.maximum(1 - p_i, 0.0) + 1e-10) * jnp.cumprod(
        jnp.concatenate([jnp.ones_like(p_i[..., :1]), p_i], axis=-1),
        axis=-1)[..., :-1]

    rgb_map = jnp.sum(tau_i[..., None] * radiances[..., :-1, :], axis=-2)
    depth_map = jnp.sum(
        tau_i / (jnp.sum(tau_i, -1, keepdims=True) + 1e-10) * d_all[..., :-1],
        axis=-1)
    acc_map = jnp.sum(tau_i, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {
        "rgb": rgb_map,
        "depth_volume": depth_map,
        "mask_volume": acc_map,
        # per-ray diagnostics (cheap): β heat-map + upsample iteration usage
        "beta_map": beta_map,
        "iter_usage": iter_usage,
    }
    if eik_nablas is not None:
        ret["eik_nablas"] = eik_nablas
    if calc_normal:
        normals_map = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True) + 1e-10)
        P = min(tau_i.shape[-1], normals_map.shape[-2])
        ret["normals_volume"] = jnp.sum(
            normals_map[..., :P, :] * tau_i[..., :P, None], axis=-2)
    if detailed_output:
        ret["implicit_surface"] = sdf
        ret["implicit_nablas"] = nablas
        ret["radiance"] = radiances
        ret["alpha"] = 1.0 - p_i
        ret["p_i"] = p_i
        ret["visibility_weights"] = tau_i
        ret["d_vals"] = d_all
        ret["sigma"] = sigma
        if use_nerfplusplus:
            ret["sigma_out"] = sigma_out
            ret["radiance_out"] = radiance_out
    return ret


def make_volume_render_fn(model: VolSDF, **render_kwargs):
    for k in ("H", "W", "rayschunk", "netchunk", "batched"):
        render_kwargs.pop(k, None)

    def render(params, rays_o, rays_d, key, eik_pts=None, fine_override=None):
        prefix = rays_o.shape[:-1]
        if eik_pts is not None:
            eik_pts = eik_pts.reshape(-1, *eik_pts.shape[len(prefix):])
        ret = volume_render_rays(model, params, rays_o, rays_d, key,
                                 eik_pts=eik_pts, fine_override=fine_override,
                                 **render_kwargs)
        ret = {k: v.reshape(prefix + v.shape[1:]) for k, v in ret.items()}
        return ret["rgb"], ret["depth_volume"], ret

    return render


def make_ray_loss_fn(model: VolSDF, args, render_kwargs_train: dict):
    """ray_loss(params, ray_batch, key, it) per ref volsdf.py:572-644 —
    shardable over the ray axis."""
    w_eikonal = float(args.training.w_eikonal)
    eik_bounding_box = float(args.model.obj_bounding_radius)
    # SIREN-rescue experiment (off by default): the reference-recipe SIREN
    # run collapses into the empty-scene minimum (sdf > 0 everywhere by 25k,
    # docs/quality.md); a decaying interior anchor keeps a zero crossing
    # alive through the fragile phase and vanishes by sdf_anchor_until, so
    # the converged objective is unchanged.
    w_anchor = float(args.training.get("w_sdf_anchor", 0.0))
    anchor_until = max(1, int(args.training.get("sdf_anchor_until", 20000)))
    anchor_target = float(args.training.get("sdf_anchor_target", -1.0))
    render_fn = make_volume_render_fn(
        model, detailed_output=True,
        **{k: v for k, v in render_kwargs_train.items() if k not in ("H", "W")})

    def ray_loss(params, rb, key, it, fine_override=None):
        k_render, k_eik = jax.random.split(key)
        target_rgb = rb["target_rgb"]
        mask_ignore = rb.get("mask_ignore")

        # one uniform box point per ray, queried INSIDE the renderer's single
        # batched network call (a second forward_with_nablas instance in the
        # same program crashes this environment's TPU compiler)
        eik_pts = jax.random.uniform(
            k_eik, rb["rays_o"].shape[:-1] + (1, 3), jnp.float32,
            -eik_bounding_box, eik_bounding_box)
        rgb, depth_v, extras = render_fn(params, rb["rays_o"], rb["rays_d"],
                                         k_render, eik_pts=eik_pts,
                                         fine_override=fine_override)

        nablas = extras["implicit_nablas"]  # [..., N_rays, P, 3]
        # single max-visibility surface point per ray (§3.5 of the paper)
        ind = jnp.argmax(extras["visibility_weights"][..., :nablas.shape[-2]],
                         axis=-1)
        nablas_surf = jnp.take_along_axis(
            nablas, ind[..., None, None].repeat(3, -1), axis=-2)
        nablas_eik = extras["eik_nablas"]
        nablas_all = jnp.concatenate([nablas_surf, nablas_eik], axis=-2)
        nablas_norm = jnp.linalg.norm(nablas_all, axis=-1)

        losses = {}
        loss_img = jnp.abs(rgb - target_rgb)
        losses["loss_eikonal"] = w_eikonal * jnp.mean((nablas_norm - 1.0) ** 2)
        if mask_ignore is not None:
            mi = mask_ignore.astype(jnp.float32)
            losses["loss_img"] = (jnp.sum(loss_img * mi[..., None])
                                  / (jnp.sum(mi) + 1e-10))
        else:
            losses["loss_img"] = jnp.mean(loss_img)
        sdf0 = None
        if w_anchor > 0.0:
            # plain (nablas-free) sdf query at the origin: a second
            # forward_with_nablas instance would crash this environment's
            # TPU compiler, a tiny plain forward does not
            sdf0 = model.forward_surface(params, jnp.zeros((1, 3)))
            wt = w_anchor * jnp.maximum(0.0, 1.0 - it / anchor_until)
            losses["loss_sdf_anchor"] = wt * jnp.mean(
                (sdf0 - anchor_target) ** 2)

        total = sum(losses.values())
        losses["total"] = total
        extras["implicit_nablas_norm"] = nablas_norm
        alpha, beta = model.forward_ab(params)
        extras["scalars"] = {"beta": beta, "alpha": alpha}
        if sdf0 is not None:
            # collapse forensics need the sdf(0) trajectory (docs/quality.md:
            # the un-anchored run drifts +0.47 -> +0.78 with no zero crossing)
            extras["scalars"]["sdf_origin"] = sdf0[0]
        return total, (losses, extras)

    return ray_loss


def make_pipeline_fns(model: VolSDF, args, render_kwargs_train: dict):
    """Split the train step for software pipelining (training.overlap_sampler)
    — same contract as neus.make_pipeline_fns: depth_sample + loss_with_samples
    under the same key equal the fused ray_loss exactly (ray_loss splits key
    into (k_render, k_eik) and the renderer splits k_render into (key_fine, _);
    depth_sample replays both splits)."""
    sample_kwargs = {k: v for k, v in render_kwargs_train.items()
                     if k not in ("H", "W", "rayschunk")}
    ray_loss = make_ray_loss_fn(model, args, render_kwargs_train)

    def depth_sample(params, rb, key):
        k_render, _k_eik = jax.random.split(key)
        fine = compute_ray_samples(model, params, rb["rays_o"], rb["rays_d"],
                                   k_render, **sample_kwargs)
        prefix = rb["rays_o"].shape[:-1]
        return tuple(x.reshape(prefix + x.shape[1:]) for x in fine)

    def loss_with_samples(params, rb, fine, key, it):
        return ray_loss(params, rb, key, it, fine_override=fine)

    return {"depth_sample": depth_sample,
            "loss_with_samples": loss_with_samples}


def make_trainer(model: VolSDF, args, render_kwargs_train: dict):
    from neurecon_tpu.training import sample_ray_batch

    H, W = render_kwargs_train["H"], render_kwargs_train["W"]
    N_rays = args.data.N_rays
    ray_loss = make_ray_loss_fn(model, args, render_kwargs_train)

    def loss_fn(params, batch, key, it):
        k_rays, k_render = jax.random.split(key)
        rb = sample_ray_batch(k_rays, batch, H, W, N_rays)
        return ray_loss(params, rb, k_render, it)

    return loss_fn


def get_model(args):
    model_config = {
        "use_nerfplusplus": args.model.setdefault("outside_scene",
                                                  "builtin") == "nerf++",
        "obj_bounding_radius": args.model.obj_bounding_radius,
        "W_geo_feat": args.model.setdefault("W_geometry_feature", 256),
        "speed_factor": args.training.setdefault("speed_factor", 1.0),
        "beta_init": args.training.setdefault("beta_init", 0.1),
    }
    surface_cfg = {
        "use_siren": args.model.surface.setdefault(
            "use_siren", args.model.setdefault("use_siren", False)),
        "embed_multires": args.model.surface.setdefault("embed_multires", 6),
        "radius_init": args.model.surface.setdefault("radius_init", 1.0),
        "geometric_init": args.model.surface.setdefault("geometric_init", True),
        "D": args.model.surface.setdefault("D", 8),
        "W": args.model.surface.setdefault("W", 256),
        "skips": args.model.surface.setdefault("skips", [4]),
        # surface-existence prior: sdf = (|x| - radius_init) + f(x)
        # (base.py sphere_residual; designed for the SIREN recipe whose
        # pretrained sphere is otherwise destroyed, docs/quality.md)
        "sphere_residual": args.model.surface.setdefault(
            "sphere_residual", False),
    }
    radiance_cfg = {
        "use_siren": args.model.radiance.setdefault(
            "use_siren", args.model.setdefault("use_siren", False)),
        "embed_multires": args.model.radiance.setdefault("embed_multires", -1),
        "embed_multires_view": args.model.radiance.setdefault("embed_multires_view", -1),
        "use_view_dirs": args.model.radiance.setdefault("use_view_dirs", True),
        "D": args.model.radiance.setdefault("D", 4),
        "W": args.model.radiance.setdefault("W", 256),
        "skips": args.model.radiance.setdefault("skips", []),
    }
    model = VolSDF(surface_cfg=surface_cfg, radiance_cfg=radiance_cfg, **model_config)

    render_kwargs_train = {
        "near": args.data.near,
        "far": args.data.far,
        "N_samples": args.model.setdefault("N_samples", 128),
        "N_importance": args.model.setdefault("N_importance", 64),
        "N_outside": args.model.setdefault("N_outside", 32),
        "perturb": args.model.setdefault("perturb", True),
        "white_bkgd": args.model.setdefault("white_bkgd", False),
        "max_upsample_steps": args.model.setdefault("max_upsample_iter", 5),
        "max_bisection_steps": args.model.setdefault("max_bisection_steps", 10),
        "epsilon": args.model.setdefault("epsilon", 0.1),
        "fine_sample_mul": args.model.setdefault("fine_sample_mul", 4),
        "use_nerfplusplus": model_config["use_nerfplusplus"],
        "obj_bounding_radius": args.model.obj_bounding_radius,
    }
    render_kwargs_test = copy.deepcopy(render_kwargs_train)
    render_kwargs_test["rayschunk"] = args.data.val_rayschunk
    render_kwargs_test["perturb"] = False

    trainer = functools.partial(make_trainer, model, args)
    return model, trainer, render_kwargs_train, render_kwargs_test, \
        functools.partial(make_volume_render_fn, model)
