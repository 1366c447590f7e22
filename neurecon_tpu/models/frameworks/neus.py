"""NeuS (logistic-CDF sdf→α volume rendering) — TPU-native implementation.

Parity targets in the reference (/root/reference/models/frameworks/neus.py):
  * cdf_Phi_s / sdf_to_alpha / sdf_to_w / alpha_to_w       (neus.py:21-70)
  * learnable ln_s with speed_factor, s = exp(ln_s * sf)   (neus.py:86,108-109)
  * hierarchical up-sampling, all three algorithms          (neus.py:203-279)
  * section-point sdf + mid-point radiance compositor       (neus.py:281-368)
  * NeRF++ outside branch with inside/outside alpha merge   (neus.py:303-343)
  * Trainer losses: L1 rgb + eikonal + optional mask BCE    (neus.py:453-478)

TPU-first design: the reference's `rayschunk`/`netchunk` host loops and
nn.DataParallel scatter are gone. The whole render step — ray generation,
up-sampling (a fixed-trip unrolled loop with statically growing sample
buffers), double-gradient MLP evaluation, and compositing — traces into ONE
XLA program; scaling is done by sharding the ray axis over a device mesh
(see neurecon_tpu/parallel). The up-sampler runs on stop_gradient'd params so
the backward pass never enters it (replacing torch.no_grad at neus.py:214).
"""
from __future__ import annotations

import copy
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.base import NeRF, ImplicitSurface, RadianceNet
from neurecon_tpu.ops import near_far_from_sphere, sample_pdf
from neurecon_tpu.ops.fused_upsample import (fused_neus_upsample,
                                             fused_upsample_enabled)


def cdf_Phi_s(x, s):
    return jax.nn.sigmoid(x * s)


def sdf_to_alpha(sdf, s):
    """sdf at section points [..., P] -> (cdf [..., P], alpha [..., P-1])."""
    cdf = cdf_Phi_s(sdf, s)
    opacity_alpha = (cdf[..., :-1] - cdf[..., 1:]) / (cdf[..., :-1] + 1e-10)
    return cdf, jnp.maximum(opacity_alpha, 0.0)


def alpha_to_w(alpha):
    """alpha [..., P] -> visibility weights via shifted-transmittance cumprod.

    max(1-alpha, 0) is written out (alpha <= 1 anyway) to defeat an XLA
    reassociation: `1.0 - alpha + 1e-10` gets rewritten to
    `(1.0 + 1e-10) - alpha` == `1.0 - alpha` (1e-10 is below the f32 ulp of
    1), which silently deletes the reference's stabilizer under jit
    (docs/probes/xla_stabilizer_fold_probe.py; ref utils.py alpha->w).
    """
    shifted_transparency = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]),
         jnp.maximum(1.0 - alpha, 0.0) + 1e-10], axis=-1)
    return alpha * jnp.cumprod(shifted_transparency, axis=-1)[..., :-1]


def sdf_to_w(sdf, s):
    cdf, alpha = sdf_to_alpha(sdf, s)
    return cdf, alpha, alpha_to_w(alpha)


class NeuS:
    """Stateless NeuS module: static config + pure init/forward functions."""

    def __init__(self,
                 variance_init: float = 0.05,
                 speed_factor: float = 1.0,
                 input_ch: int = 3,
                 W_geo_feat: int = -1,
                 use_outside_nerf: bool = False,
                 obj_bounding_radius: float = 1.0,
                 surface_cfg: Optional[dict] = None,
                 radiance_cfg: Optional[dict] = None):
        self.speed_factor = speed_factor
        self.ln_s_init = -np.log(variance_init) / speed_factor
        self.use_outside_nerf = use_outside_nerf
        self.obj_bounding_radius = obj_bounding_radius

        self.implicit_surface = ImplicitSurface(
            W_geo_feat=W_geo_feat, input_ch=input_ch,
            obj_bounding_size=obj_bounding_radius, **(surface_cfg or {}))
        if W_geo_feat < 0:
            W_geo_feat = self.implicit_surface.W
        self.radiance_net = RadianceNet(W_geo_feat=W_geo_feat, **(radiance_cfg or {}))
        self.nerf_outside = (
            NeRF(input_ch=4, multires=10, multires_view=4, use_view_dirs=True)
            if use_outside_nerf else None)

    def init(self, key: jax.Array):
        ks, kr, kn = jax.random.split(key, 3)
        params = {
            "ln_s": jnp.asarray([self.ln_s_init], jnp.float32),
            "implicit_surface": self.implicit_surface.init(ks),
            "radiance_net": self.radiance_net.init(kr),
        }
        if self.nerf_outside is not None:
            params["nerf_outside"] = self.nerf_outside.init(kn)
        return params

    def forward_s(self, params):
        return jnp.exp(params["ln_s"][0] * self.speed_factor)

    def forward_surface(self, params, x):
        return self.implicit_surface.forward(params["implicit_surface"], x)

    def forward_surface_fast(self, params, x):
        """Gradient-free sdf query (fused Pallas kernel on TPU)."""
        return self.implicit_surface.forward_query(params["implicit_surface"], x)

    def forward_with_nablas(self, params, x):
        return self.implicit_surface.forward_with_nablas(params["implicit_surface"], x)

    def forward_radiance(self, params, x, view_dirs):
        _, nablas, geo_feat = self.forward_with_nablas(params, x)
        return self.radiance_net.forward(params["radiance_net"], x, view_dirs,
                                         nablas, geo_feat)

    def forward(self, params, x, view_dirs):
        sdf, nablas, geo_feat = self.forward_with_nablas(params, x)
        radiances = self.radiance_net.forward(params["radiance_net"], x, view_dirs,
                                              nablas, geo_feat)
        return radiances, sdf, nablas


def _stratified_outside_jitter(key, d_vals_out):
    mids = 0.5 * (d_vals_out[..., 1:] + d_vals_out[..., :-1])
    upper = jnp.concatenate([mids, d_vals_out[..., -1:]], axis=-1)
    lower = jnp.concatenate([d_vals_out[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, upper.shape)
    return lower + (upper - lower) * t_rand


def neus_upsample(model: NeuS, params, rays_o, rays_d, d_coarse, key,
                  *, upsample_algo: str, N_importance: int,
                  N_upsample_iters: int, N_nograd_samples: int,
                  fixed_s_recp: float, perturb: bool, near=None, far=None):
    """Hierarchical up-sampling (ref neus.py:203-279), gradient-free.

    Fixed-trip: the `official_solution` loop is unrolled at trace time with
    statically growing sample buffers (64 -> 64 + i*(N_importance//iters)),
    so it compiles into the single render program. Returns sorted d_all.
    """
    sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def query_sdf(d):
        # plain jnp forward: the fused Pallas kernel measured NEUTRAL inside
        # the differentiated train program on real TPU — it only wins on the
        # big eval-time batches (mesh grids, casting); see docs/performance.md
        pts = rays_o[..., None, :] + rays_d[..., None, :] * d[..., :, None]
        return model.forward_surface(sg_params, pts)

    # NOTE on sorting: a comparison-count merge of the two already-sorted
    # buffers (ops.merge_sorted) was benchmarked against concat+sort on the
    # real chip and LOST (12.6k vs 13.8k rays/s/chip end-to-end) — XLA's
    # [N, 128] sort is cheap while the count matrices add HBM traffic — so
    # the upsamplers keep the sort (docs/performance.md, round 2).
    if upsample_algo == "direct_use":
        sdf_coarse = query_sdf(d_coarse)
        *_, w_coarse = sdf_to_w(sdf_coarse, 1.0 / fixed_s_recp)
        d_fine = sample_pdf(key, d_coarse, w_coarse, N_importance, det=not perturb)
        d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
        return jax.lax.stop_gradient(d_all)

    if upsample_algo == "direct_more":
        t = jnp.linspace(0.0, 1.0, N_nograd_samples)
        _d = near * (1 - t) + far * t
        _sdf = query_sdf(_d)
        *_, _w = sdf_to_w(_sdf, 1.0 / fixed_s_recp)
        d_fine = sample_pdf(key, _d, _w, N_importance, det=not perturb)
        d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
        return jax.lax.stop_gradient(d_all)

    assert upsample_algo == "official_solution", upsample_algo
    n_per_iter = N_importance // N_upsample_iters
    if fused_upsample_enabled():
        # Pallas megakernel: the whole loop below in one VMEM-resident
        # kernel (ops/fused_upsample.py). Same key-split sequence; sorted
        # per-round uniforms give the same sample SET, and the merged
        # output is sorted either way.
        us = []
        for i in range(N_upsample_iters):
            key, sub = jax.random.split(key)
            if perturb:
                us.append(jnp.sort(
                    jax.random.uniform(
                        sub, d_coarse.shape[:-1] + (n_per_iter,)), axis=-1))
            else:
                us.append(jnp.broadcast_to(
                    jnp.linspace(0.0, 1.0, n_per_iter),
                    d_coarse.shape[:-1] + (n_per_iter,)))
        d_all = fused_neus_upsample(
            model.implicit_surface, sg_params["implicit_surface"],
            rays_o, rays_d, d_coarse, jnp.concatenate(us, axis=-1),
            n_iters=N_upsample_iters, n_per_iter=n_per_iter)
        return jax.lax.stop_gradient(d_all)
    _d = d_coarse
    _sdf = query_sdf(_d)
    for i in range(N_upsample_iters):
        key, sub = jax.random.split(key)
        prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
        prev_z, next_z = _d[..., :-1], _d[..., 1:]
        mid_sdf = 0.5 * (prev_sdf + next_sdf)
        dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
        prev_dot_val = jnp.concatenate(
            [jnp.zeros_like(dot_val[..., :1]), dot_val[..., :-1]], axis=-1)
        # min of this segment's slope and the previous segment's slope
        dot_val = jnp.clip(jnp.minimum(prev_dot_val, dot_val), -10.0, 0.0)

        dist = next_z - prev_z
        prev_esti_sdf = mid_sdf - dot_val * dist * 0.5
        next_esti_sdf = mid_sdf + dot_val * dist * 0.5
        s = 64 * (2 ** i)  # per-iteration sharpening
        prev_cdf = cdf_Phi_s(prev_esti_sdf, s)
        next_cdf = cdf_Phi_s(next_esti_sdf, s)
        alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
        _w = alpha_to_w(alpha)
        d_fine = sample_pdf(sub, _d, _w, n_per_iter, det=not perturb)

        sdf_fine = query_sdf(d_fine)
        _d = jnp.concatenate([_d, d_fine], axis=-1)
        _sdf = jnp.concatenate([_sdf, sdf_fine], axis=-1)
        # one stable 2-operand sort network co-sorts (d, sdf); bitwise equal
        # to stable argsort + two take_along_axis gathers, minus the gathers
        # and the iota operand
        _d, _sdf = jax.lax.sort((_d, _sdf), dimension=-1, is_stable=True,
                                num_keys=1)
    return jax.lax.stop_gradient(_d)


def _prepare_rays(rays_o, rays_d, obj_bounding_radius,
                  near_bypass=None, far_bypass=None):
    """Flatten + normalize rays and intersect the bounding sphere — the shared
    preamble of rendering and of the stand-alone depth sampler (so a pipelined
    step computes identical near/far to the fused one)."""
    rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(rays_o, rays_d, r=obj_bounding_radius)
    if near_bypass is not None:
        near = jnp.full_like(near, near_bypass)
    if far_bypass is not None:
        far = jnp.full_like(far, far_bypass)
    return rays_o, rays_d, near, far


def compute_ray_samples(model: NeuS, params, rays_o, rays_d, key,
                        *,
                        obj_bounding_radius: float = 1.0,
                        near_bypass: Optional[float] = None,
                        far_bypass: Optional[float] = None,
                        perturb: bool = False,
                        fixed_s_recp: float = 1 / 64.0,
                        N_samples: int = 64,
                        N_importance: int = 64,
                        upsample_algo: str = "official_solution",
                        N_nograd_samples: int = 2048,
                        N_upsample_iters: int = 4,
                        **dummy_kwargs):
    """Gradient-free section-depth sampler, callable OUTSIDE the render: the
    coarse linspace + hierarchical upsample that volume_render_rays runs when
    no d_all_override is given. Splits `key` exactly like the renderer does,
    so sample(params, rays, key) + render(..., d_all_override=...) with the
    SAME key reproduces the fused render bit for bit. Used by the pipelined
    train step to overlap this (no-grad) work with the previous step's
    backward (docs/performance.md round-3 roadmap)."""
    rays_o, rays_d, near, far = _prepare_rays(
        rays_o, rays_d, obj_bounding_radius, near_bypass, far_bypass)
    key_up, _key_out = jax.random.split(key)
    _t = jnp.linspace(0, 1, N_samples)
    d_coarse = near * (1 - _t) + far * _t
    return neus_upsample(
        model, params, rays_o, rays_d, d_coarse, key_up,
        upsample_algo=upsample_algo, N_importance=N_importance,
        N_upsample_iters=N_upsample_iters, N_nograd_samples=N_nograd_samples,
        fixed_s_recp=fixed_s_recp, perturb=perturb, near=near, far=far)


def volume_render_rays(model: NeuS, params, rays_o, rays_d, key,
                       *,
                       obj_bounding_radius: float = 1.0,
                       use_view_dirs: bool = True,
                       white_bkgd: bool = False,
                       near_bypass: Optional[float] = None,
                       far_bypass: Optional[float] = None,
                       perturb: bool = False,
                       fixed_s_recp: float = 1 / 64.0,
                       N_samples: int = 64,
                       N_importance: int = 64,
                       N_outside: int = 0,
                       upsample_algo: str = "official_solution",
                       N_nograd_samples: int = 2048,
                       N_upsample_iters: int = 4,
                       calc_normal: bool = False,
                       detailed_output: bool = True,
                       d_all_override=None,
                       **dummy_kwargs):
    """Render a flat batch of rays [N, 3] -> dict of per-ray outputs.

    Fully jittable; static config comes through keyword closure. rays_d need
    not be normalized (its norm is the pixel footprint ratio) — normalized here
    like ref neus.py:172. `d_all_override` (from compute_ray_samples, possibly
    computed with slightly stale params by the pipelined train step) skips the
    in-render sampler.
    """
    rays_o, rays_d, near, far = _prepare_rays(
        rays_o, rays_d, obj_bounding_radius, near_bypass, far_bypass)
    view_dirs = rays_d if use_view_dirs else None

    key_up, key_out = jax.random.split(key)

    if d_all_override is not None:
        d_all = jax.lax.stop_gradient(
            d_all_override.reshape(rays_o.shape[0], -1))
    else:
        # coarse samples
        _t = jnp.linspace(0, 1, N_samples)
        d_coarse = near * (1 - _t) + far * _t

        # hierarchical up-sampling (gradient-free)
        d_all = neus_upsample(
            model, params, rays_o, rays_d, d_coarse, key_up,
            upsample_algo=upsample_algo, N_importance=N_importance,
            N_upsample_iters=N_upsample_iters, N_nograd_samples=N_nograd_samples,
            fixed_s_recp=fixed_s_recp, perturb=perturb, near=near, far=far)

    # section points & mid points (sdf on sections, radiance on mids)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]
    d_mid = 0.5 * (d_all[..., 1:] + d_all[..., :-1])
    pts_mid = rays_o[..., None, :] + rays_d[..., None, :] * d_mid[..., :, None]

    # one batched sdf+nablas query over sections ∪ mids (the reference runs
    # two separate autograd passes, neus.py:294-298; identical math, one
    # backward graph): sections feed alpha + eikonal, mids feed radiance
    P = pts.shape[-2]
    pts_all = jnp.concatenate([pts, pts_mid], axis=-2)
    sdf_all, nablas_all, h_all = model.forward_with_nablas(params, pts_all)
    sdf, nablas = sdf_all[..., :P], nablas_all[..., :P, :]
    nablas_mid, h_mid = nablas_all[..., P:, :], h_all[..., P:, :]
    cdf, opacity_alpha = sdf_to_alpha(sdf, model.forward_s(params))
    view_dirs_mid = (jnp.broadcast_to(view_dirs[..., None, :], pts_mid.shape)
                     if use_view_dirs else None)
    radiances = model.radiance_net.forward(params["radiance_net"], pts_mid,
                                           view_dirs_mid, nablas_mid, h_mid)

    # NeRF++ outside branch
    sigma_out = radiance_out = None
    if N_outside > 0:
        _t_out = jnp.linspace(0, 1, N_outside + 2)[1:-1]
        d_vals_out = far / jnp.flip(_t_out, axis=-1)  # [N, N_outside]
        if perturb:
            d_vals_out = _stratified_outside_jitter(key_out, d_vals_out)
        d_vals_out = jnp.concatenate([d_mid, d_vals_out], axis=-1)  # sorted
        pts_out = rays_o[..., None, :] + rays_d[..., None, :] * d_vals_out[..., :, None]
        # safe norm: the inside d_mid samples ride through this inverted-
        # sphere parameterization too, and a ray through the exact scene
        # origin (synthetic scenes have perfectly centered principal rays)
        # puts a sample at r == 0. The resulting 0/0 NaN is masked out of the
        # FORWARD by the where-merge below, but 0-cotangent x NaN-activation
        # still poisons every nerf_outside parameter gradient (classic
        # both-branches-of-where gotcha) — one such step NaN'd the whole
        # background net. max(r2, 1e-12) has zero gradient at the clamp, so
        # the fix is exact for every r > 1e-6.
        r = jnp.sqrt(jnp.maximum(
            jnp.sum(pts_out ** 2, axis=-1, keepdims=True), 1e-12))
        x_out = jnp.concatenate([pts_out / r, 1.0 / r], axis=-1)
        views_out = (jnp.broadcast_to(view_dirs[..., None, :], pts_out.shape)
                     if use_view_dirs else None)
        sigma_out, radiance_out = model.nerf_outside.forward(
            params["nerf_outside"], x_out, views_out)
        dists = d_vals_out[..., 1:] - d_vals_out[..., :-1]
        dists = jnp.concatenate([dists, 1e10 * jnp.ones_like(dists[..., :1])], axis=-1)
        # softplus instead of relu, as in the official NeuS repo
        alpha_out = 1 - jnp.exp(-jax.nn.softplus(sigma_out) * dists)

        N_pts_1 = d_mid.shape[-1]
        mask_inside = jnp.linalg.norm(pts_mid, axis=-1) <= obj_bounding_radius
        alpha_in = jnp.where(mask_inside, opacity_alpha, alpha_out[..., :N_pts_1])
        opacity_alpha = jnp.concatenate([alpha_in, alpha_out[..., N_pts_1:]], axis=-1)
        radiance_in = jnp.where(mask_inside[..., None], radiances,
                                radiance_out[..., :N_pts_1, :])
        radiances = jnp.concatenate(
            [radiance_in, radiance_out[..., N_pts_1:, :]], axis=-2)
        d_final = d_vals_out
    else:
        d_final = d_mid

    # ray integration
    visibility_weights = alpha_to_w(opacity_alpha)
    rgb_map = jnp.sum(visibility_weights[..., None] * radiances, axis=-2)
    depth_map = jnp.sum(
        visibility_weights / (jnp.sum(visibility_weights, -1, keepdims=True) + 1e-10)
        * d_final, axis=-1)
    acc_map = jnp.sum(visibility_weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {
        "rgb": rgb_map,            # [N, 3]
        "depth_volume": depth_map,  # [N]
        "mask_volume": acc_map,     # [N]
    }
    if calc_normal:
        normals_map = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True) + 1e-10)
        P = min(visibility_weights.shape[-1], normals_map.shape[-2])
        ret["normals_volume"] = jnp.sum(
            normals_map[..., :P, :] * visibility_weights[..., :P, None], axis=-2)
    if detailed_output:
        ret["implicit_nablas"] = nablas
        ret["implicit_surface"] = sdf
        ret["radiance"] = radiances
        ret["alpha"] = opacity_alpha
        ret["cdf"] = cdf
        ret["visibility_weights"] = visibility_weights
        ret["d_final"] = d_final
        if N_outside > 0:
            ret["sigma_out"] = sigma_out
            ret["radiance_out"] = radiance_out
    return ret


def make_volume_render_fn(model: NeuS, **render_kwargs):
    """Build (params, rays_o, rays_d, key) -> (rgb, depth, extras) preserving
    leading batch dims; static render options baked into the closure."""
    for k in ("H", "W", "rayschunk", "netchunk", "batched"):
        render_kwargs.pop(k, None)

    def render(params, rays_o, rays_d, key, d_all=None):
        prefix = rays_o.shape[:-1]
        ret = volume_render_rays(model, params, rays_o, rays_d, key,
                                 d_all_override=d_all, **render_kwargs)
        ret = {k: v.reshape(prefix + v.shape[1:]) for k, v in ret.items()}
        return ret["rgb"], ret["depth_volume"], ret

    return render


def compute_losses(model: NeuS, params, rays_o, rays_d, target_rgb, key, *,
                   render_fn, w_eikonal: float, with_mask: bool,
                   w_mask: float = 0.0, target_mask=None, mask_ignore=None,
                   d_all=None):
    """NeuS training losses (ref neus.py:417-485): L1 rgb + eikonal on all
    sample points + optional mask BCE on the clamped accumulation map."""
    rgb, depth_v, extras = render_fn(params, rays_o, rays_d, key, d_all=d_all)

    nablas = extras["implicit_nablas"]
    nablas_norm = jnp.linalg.norm(nablas, axis=-1)
    # clamp against exploding BCE gradient when pred ~ 1 but GT = 0
    mask_volume = jnp.clip(extras["mask_volume"], 1e-3, 1 - 1e-3)
    extras["mask_volume_clipped"] = mask_volume

    losses = {}
    loss_img = jnp.abs(rgb - target_rgb)  # [..., N_rays, 3]
    losses["loss_eikonal"] = w_eikonal * jnp.mean((nablas_norm - 1.0) ** 2)

    if with_mask:
        tm = target_mask.astype(jnp.float32)
        bce = -(tm * jnp.log(mask_volume) + (1 - tm) * jnp.log(1 - mask_volume))
        losses["loss_mask"] = w_mask * jnp.mean(bce)
        if mask_ignore is not None:
            tm = jnp.logical_and(target_mask, mask_ignore).astype(jnp.float32)
        losses["loss_img"] = (jnp.sum(loss_img * tm[..., None])
                              / (jnp.sum(tm) + 1e-10))
    else:
        if mask_ignore is not None:
            mi = mask_ignore.astype(jnp.float32)
            losses["loss_img"] = (jnp.sum(loss_img * mi[..., None])
                                  / (jnp.sum(mi) + 1e-10))
        else:
            losses["loss_img"] = jnp.mean(loss_img)

    total = sum(losses.values())
    losses["total"] = total
    extras["implicit_nablas_norm"] = nablas_norm
    extras["scalars"] = {"1/s": 1.0 / model.forward_s(params)}
    return total, (losses, extras)


def make_ray_loss_fn(model: NeuS, args, render_kwargs_train: dict):
    """ray_loss(params, ray_batch, key, it) — per-ray loss, shardable over the
    ray axis (ray_batch from training.sample_ray_batch)."""
    with_mask = bool(args.training.with_mask)
    w_mask = float(args.training.setdefault("w_mask", 0.0))
    w_eikonal = float(args.training.w_eikonal)
    render_fn = make_volume_render_fn(
        model, detailed_output=True, **{k: v for k, v in render_kwargs_train.items()
                                        if k not in ("H", "W")})

    def ray_loss(params, rb, key, it, d_all=None):
        return compute_losses(
            model, params, rb["rays_o"], rb["rays_d"], rb["target_rgb"], key,
            render_fn=render_fn, w_eikonal=w_eikonal, with_mask=with_mask,
            w_mask=w_mask, target_mask=rb.get("target_mask"),
            mask_ignore=rb.get("mask_ignore"), d_all=d_all)

    return ray_loss


def make_pipeline_fns(model: NeuS, args, render_kwargs_train: dict):
    """Split the train step for software pipelining (training.overlap_sampler):

      depth_sample(params, rb, key) -> d_all   (gradient-free upsampler)
      loss_with_samples(params, rb, d_all, key, it) -> (total, aux)

    depth_sample(p, rb, k) + loss_with_samples(p, rb, d, k, it) with the SAME
    key equals ray_loss(p, rb, k, it) exactly (the key split is shared, see
    compute_ray_samples). The pipelined block calls depth_sample with the
    PRE-update params of the step whose backward it overlaps — sample
    placement is then one step stale, which only moves the (heuristic)
    quadrature points; the rendered values and gradients always use fresh
    params. See parallel/sharding.py:make_sharded_train_block.
    """
    sample_kwargs = {k: v for k, v in render_kwargs_train.items()
                     if k not in ("H", "W", "rayschunk")}
    ray_loss = make_ray_loss_fn(model, args, render_kwargs_train)

    def depth_sample(params, rb, key):
        d = compute_ray_samples(model, params, rb["rays_o"], rb["rays_d"],
                                key, **sample_kwargs)
        # restore the batch/ray leading dims so d_all shards on the ray axis
        # (dim 1) exactly like every other ray-batch leaf
        return d.reshape(rb["rays_o"].shape[:-1] + d.shape[-1:])

    def loss_with_samples(params, rb, d_all, key, it):
        return ray_loss(params, rb, key, it, d_all=d_all)

    return {"depth_sample": depth_sample,
            "loss_with_samples": loss_with_samples}


def make_trainer(model: NeuS, args, render_kwargs_train: dict):
    """Returns loss_fn(params, batch, key, it) -> (total, (losses, extras)).

    batch: {'c2w' [B,4,4], 'intrinsics' [B,4,4], 'rgb' [B,H*W,3],
            'object_mask' [B,H*W] (optional), 'mask_ignore' [B,H*W] (optional)}.
    Pixel selection happens on device with the folded key.
    """
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
    """Build (model, trainer_loss_fn, render_kwargs_train, render_kwargs_test,
    volume_render_factory) from a config (ref neus.py:488-546)."""
    if not args.training.with_mask:
        assert "N_outside" in args.model and args.model.N_outside > 0, \
            "Please specify a positive model:N_outside for neus with nerf++"

    model_config = {
        "obj_bounding_radius": args.model.obj_bounding_radius,
        "W_geo_feat": args.model.setdefault("W_geometry_feature", 256),
        "use_outside_nerf": not args.training.with_mask,
        "speed_factor": args.training.setdefault("speed_factor", 1.0),
        "variance_init": args.model.setdefault("variance_init", 0.05),
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
    model = NeuS(surface_cfg=surface_cfg, radiance_cfg=radiance_cfg, **model_config)

    render_kwargs_train = {
        "upsample_algo": args.model.setdefault("upsample_algo", "official_solution"),
        "N_nograd_samples": args.model.setdefault("N_nograd_samples", 2048),
        "N_upsample_iters": args.model.setdefault("N_upsample_iters", 4),
        "N_samples": args.model.setdefault("N_samples", 64),
        "N_importance": args.model.setdefault("N_importance", 64),
        "N_outside": args.model.setdefault("N_outside", 0),
        "obj_bounding_radius": args.data.setdefault("obj_bounding_radius", 1.0),
        "perturb": args.model.setdefault("perturb", True),
        "white_bkgd": args.model.setdefault("white_bkgd", False),
    }
    render_kwargs_test = copy.deepcopy(render_kwargs_train)
    render_kwargs_test["rayschunk"] = args.data.val_rayschunk
    render_kwargs_test["perturb"] = False

    trainer = functools.partial(make_trainer, model, args)
    return model, trainer, render_kwargs_train, render_kwargs_test, \
        functools.partial(make_volume_render_fn, model)
