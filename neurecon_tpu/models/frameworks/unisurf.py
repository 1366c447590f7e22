"""UNISURF (occupancy root-finding volume rendering) — TPU-native.

Parity targets (/root/reference/models/frameworks/unisurf.py):
  * occupancy convention: logits (+)outside (-)inside;
    opacity = sigmoid(-logits) and its inverse (unisurf.py:40-62)
  * normals normalized before the radiance input (unisurf.py:34-38)
  * sampler: root-find the surface per ray, stratified N_query samples in the
    shrinking interval [d-Δ, d+Δ] + N_freespace samples in [near, d_lower],
    with no-intersection / too-close fallbacks (unisurf.py:138-208)
  * Δ decays per training iter: max(δ_max·exp(-it·δ_beta), δ_min) (unisurf.py:321)
  * Trainer: L1 rgb + normal-smoothness reg on surface points (unisurf.py:326-341)

TPU-first: the root finder is the fixed-trip masked caster from
models/ray_casting.py; `interval` is a TRACED scalar so the per-iteration
decay schedule lives inside the single compiled train step.
"""
from __future__ import annotations

import copy
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.base import ImplicitSurface, RadianceNet
from neurecon_tpu.models.ray_casting import root_finding_surface_points


def _root_find_dispatch(model, sg_params, rays_o, rays_d, *, near, far,
                        N_steps, method, logit_tau, fill_inf):
    """Gradient-free surface root find. A Pallas megakernel form existed
    through round 4 but measured NEUTRAL on-chip (the XLA lowering of the
    fixed-grid march + masked argmin + secant is already fusion-friendly)
    and was deleted in round 5; docs/performance.md keeps the writeup."""
    return root_finding_surface_points(
        lambda x: model.forward_surface(sg_params, x), rays_o, rays_d,
        near=near, far=far, N_steps=N_steps, method=method,
        logit_tau=logit_tau, fill_inf=fill_inf)
from neurecon_tpu.ops import near_far_from_sphere


class UNISURF:
    def __init__(self,
                 input_ch: int = 3,
                 W_geo_feat: int = -1,
                 surface_cfg: Optional[dict] = None,
                 radiance_cfg: Optional[dict] = None):
        self.implicit_surface = ImplicitSurface(
            input_ch=input_ch, W_geo_feat=W_geo_feat, **(surface_cfg or {}))
        if W_geo_feat < 0:
            W_geo_feat = self.implicit_surface.W
        self.radiance_net = RadianceNet(W_geo_feat=W_geo_feat, **(radiance_cfg or {}))

    def init(self, key: jax.Array):
        ks, kr = jax.random.split(key)
        return {"implicit_surface": self.implicit_surface.init(ks),
                "radiance_net": self.radiance_net.init(kr)}

    def forward_surface(self, params, x):
        return self.implicit_surface.forward(params["implicit_surface"], x)

    def forward_surface_fast(self, params, x):
        """Gradient-free occupancy-logit query (fused Pallas kernel on TPU)."""
        return self.implicit_surface.forward_query(params["implicit_surface"], x)

    def forward_with_nablas(self, params, x):
        return self.implicit_surface.forward_with_nablas(params["implicit_surface"], x)

    def forward(self, params, x, view_dirs):
        occ, nablas, geo_feat = self.forward_with_nablas(params, x)
        # OccNet nablas have no unit-norm guarantee: normalize for radiance
        normals = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True) + 1e-10)
        radiances = self.radiance_net.forward(params["radiance_net"], x, view_dirs,
                                              normals, geo_feat)
        return radiances, occ, nablas

    @staticmethod
    def get_surface_from_opacity(opacity, eps: float = 1e-4):
        opacity = np.clip(opacity, eps, 1 - eps)
        # DVR logits are (+)inside; ours are (+)outside — hence the -1
        return -1.0 * np.log(opacity / (1 - opacity))

    @staticmethod
    def get_opacity_from_surface(logits):
        odds = jnp.exp(-1.0 * logits)
        return odds / (1 + odds)


def _stratified(key, lower, upper, N: int, perturb: bool):
    """Stratified (or uniform) samples in per-ray [lower, upper]. lower/upper
    [...]; returns [..., N]."""
    if perturb:
        t = jnp.linspace(0.0, 1.0, N + 1)
        edges = lower[..., None] * (1 - t) + upper[..., None] * t
        lo, hi = edges[..., :-1], edges[..., 1:]
        u = jax.random.uniform(key, lo.shape)
        return lo + (hi - lo) * u
    t = jnp.linspace(0.0, 1.0, N)
    return lower[..., None] * (1 - t) + upper[..., None] * t


def _prepare_rays(rays_o, rays_d, radius_of_interest,
                  near_bypass=None, far_bypass=None):
    """Flatten + normalize rays and intersect the sphere of interest — shared
    by the renderer and the stand-alone surface finder (pipelined step)."""
    rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = near_far_from_sphere(rays_o, rays_d, r=radius_of_interest,
                                     keepdim=False)
    if near_bypass is not None:
        near = jnp.full_like(near, near_bypass)
    if far_bypass is not None:
        far = jnp.full_like(far, far_bypass)
    return rays_o, rays_d, near, far


def compute_ray_samples(model: UNISURF, params, rays_o, rays_d, key,
                        *,
                        logit_tau: float = 0.0,
                        method: str = "secant",
                        near_bypass: Optional[float] = None,
                        far_bypass: Optional[float] = None,
                        radius_of_interest: float = 4.0,
                        N_steps: int = 256,
                        **dummy_kwargs):
    """Gradient-free surface root-find (the N_steps-march dominating the
    sampler cost), callable OUTSIDE the render for the pipelined train step.
    Deterministic — `key` is accepted for contract uniformity and unused.
    Returns (d_pred_out, pt_pred, mask, mask_sign_change) flat over rays,
    for surface_override=."""
    del key
    rays_o, rays_d, near, far = _prepare_rays(
        rays_o, rays_d, radius_of_interest, near_bypass, far_bypass)
    sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    return _root_find_dispatch(
        model, sg_params, rays_o, rays_d, near=near, far=far,
        N_steps=N_steps, method=method, logit_tau=logit_tau, fill_inf=False)


def volume_render_rays(model: UNISURF, params, rays_o, rays_d, key, interval,
                       *,
                       logit_tau: float = 0.0,
                       use_view_dirs: bool = True,
                       method: str = "secant",
                       white_bkgd: bool = False,
                       near_bypass: Optional[float] = None,
                       far_bypass: Optional[float] = None,
                       radius_of_interest: float = 4.0,
                       perturb: bool = False,
                       too_close_threshold: float = 0.1,
                       N_query: int = 64,
                       N_freespace: int = 32,
                       N_steps: int = 256,
                       calc_normal: bool = False,
                       detailed_output: bool = True,
                       reg_perturb: Optional[float] = None,
                       surface_override=None,
                       **dummy_kwargs):
    """Render a flat batch of rays [N, 3]; `interval` is a traced scalar Δ.

    reg_perturb (static float, training only): also query nablas at the cast
    surface point and at a point jittered by ±reg_perturb — appended to the
    renderer's single batched network call (a separate forward_with_nablas
    instance in the same program crashes this environment's TPU compiler) —
    and return them as ret['nablas_surface_reg'] [N, 2, 3] for the
    normal-smoothness loss (ref unisurf.py:330-341).
    """
    rays_o, rays_d, near, far = _prepare_rays(
        rays_o, rays_d, radius_of_interest, near_bypass, far_bypass)
    view_dirs = rays_d if use_view_dirs else None
    d_threshold = near + (far - near) * too_close_threshold

    if surface_override is not None:
        # precomputed by compute_ray_samples (pipelined train step; possibly
        # one step stale — placement only, rendered values use fresh params)
        N = rays_o.shape[0]
        d_pred_out, pt_pred, mask, mask_sign_change = (
            jax.lax.stop_gradient(surface_override[0].reshape(N)),
            jax.lax.stop_gradient(surface_override[1].reshape(N, 3)),
            surface_override[2].reshape(N),
            surface_override[3].reshape(N))
    else:
        sg_params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        d_pred_out, pt_pred, mask, mask_sign_change = _root_find_dispatch(
            model, sg_params, rays_o, rays_d, near=near, far=far,
            N_steps=N_steps, method=method, logit_tau=logit_tau,
            fill_inf=False)

    d_pred_out = jnp.clip(d_pred_out, near, far)
    d_upper = jnp.minimum(d_pred_out + interval, far)
    d_lower = jnp.maximum(d_pred_out - interval, near)

    k_int, k_free = jax.random.split(key)
    d_samples_interval = _stratified(k_int, d_lower, d_upper, N_query, perturb)

    # freespace lower bound with fallbacks (ref unisurf.py:174-198)
    d_lower = jnp.maximum(d_lower, d_threshold)
    d_lower = jnp.where(mask_sign_change, d_lower, far)  # no intersection
    d_lower = jnp.where(d_lower < 1e-10, far, d_lower)   # degenerate
    d_samples_freespace = _stratified(k_free, near, d_lower, N_freespace, perturb)

    d_all = jnp.sort(jnp.concatenate(
        [d_samples_freespace, d_samples_interval], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]

    P_render = pts.shape[-2]
    if reg_perturb is not None:
        k_reg = jax.random.fold_in(key, 7)
        neighbors = pt_pred + (jax.random.uniform(k_reg, pt_pred.shape)
                               - 0.5) * 2.0 * reg_perturb
        pts = jnp.concatenate(
            [pts, pt_pred[..., None, :], neighbors[..., None, :]], axis=-2)

    views = (jnp.broadcast_to(view_dirs[..., None, :], pts.shape)
             if use_view_dirs else None)
    radiances, logits, nablas = model.forward(params, pts, views)
    nablas_surface_reg = None
    if reg_perturb is not None:
        nablas_surface_reg = nablas[..., P_render:, :]
        radiances = radiances[..., :P_render, :]
        logits = logits[..., :P_render]
        nablas = nablas[..., :P_render, :]

    opacity_alpha = UNISURF.get_opacity_from_surface(logits)
    # max(.,0) defeats the XLA reassociation that folds `1 - x + 1e-10`
    # into `1 - x` (see neus.alpha_to_w / docs/probes)
    shifted_transparency = jnp.concatenate(
        [jnp.ones_like(opacity_alpha[..., :1]),
         jnp.maximum(1.0 - opacity_alpha, 0.0) + 1e-10],
        axis=-1)
    visibility_weights = opacity_alpha * jnp.cumprod(
        shifted_transparency, axis=-1)[..., :-1]

    rgb_map = jnp.sum(visibility_weights[..., None] * radiances, axis=-2)
    depth_map = jnp.sum(
        visibility_weights
        / (jnp.sum(visibility_weights, -1, keepdims=True) + 1e-10) * d_all, axis=-1)
    acc_map = jnp.sum(visibility_weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {"rgb": rgb_map, "depth_volume": depth_map, "mask_volume": acc_map,
           # per-ray surface diagnostics (cheap, used by validation images)
           "mask_surface": mask, "depth_surface": d_pred_out}
    if nablas_surface_reg is not None:
        ret["nablas_surface_reg"] = nablas_surface_reg
    if calc_normal:
        normals_map = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True) + 1e-10)
        P = min(visibility_weights.shape[-1], normals_map.shape[-2])
        ret["normals_volume"] = jnp.sum(
            normals_map[..., :P, :] * visibility_weights[..., :P, None], axis=-2)
    if detailed_output:
        ret["surface_points"] = pt_pred
        ret["radiance"] = radiances
        ret["implicit_surface"] = logits
        ret["implicit_nablas"] = nablas
        ret["alpha"] = opacity_alpha
        ret["visibility_weights"] = visibility_weights
    return ret


def interval_at(args, it) -> float:
    """The sampling interval Δ the training loop uses at iteration `it`
    (the exponential decay in make_ray_loss_fn; ref train.py's
    `args.training.delta_max * exp(-it * delta_beta)` clamp to delta_min).

    Evaluation/val renders of a checkpoint must use the SAME Δ the model was
    trained with at that step: a late checkpoint trained at Δ=delta_min has
    its radiance supervised only inside that narrow band around the surface,
    and rendering it at the iteration-0 Δ spreads query points into regions
    the radiance never saw (measured: −9.9 dB full / −43.9 dB interior on
    the 450k UNISURF checkpoint, docs/quality.md round-5 note).
    """
    t = args.training
    return float(max(float(t.delta_max)
                     * math.exp(-float(it) * float(t.delta_beta)),
                     float(t.delta_min)))


def make_volume_render_fn(model: UNISURF, default_interval: float = 1.0,
                          **render_kwargs):
    for k in ("H", "W", "rayschunk", "netchunk", "batched", "tau"):
        render_kwargs.pop(k, None)

    def render(params, rays_o, rays_d, key, interval=None,
               surface_override=None):
        interval = default_interval if interval is None else interval
        prefix = rays_o.shape[:-1]
        ret = volume_render_rays(model, params, rays_o, rays_d, key, interval,
                                 surface_override=surface_override,
                                 **render_kwargs)
        ret = {k: v.reshape(prefix + v.shape[1:]) for k, v in ret.items()}
        return ret["rgb"], ret["depth_volume"], ret

    return render


def make_ray_loss_fn(model: UNISURF, args, render_kwargs_train: dict):
    """ray_loss(params, ray_batch, key, it) — shardable over the ray axis."""
    w_reg = float(args.training.setdefault("w_reg", 0.0))
    perturb_surface_pts = float(args.training.setdefault("perturb_surface_pts", 0.01))
    delta_max = float(args.training.delta_max)
    delta_min = float(args.training.delta_min)
    delta_beta = float(args.training.delta_beta)
    render_fn = make_volume_render_fn(
        model, detailed_output=True,
        reg_perturb=(perturb_surface_pts if w_reg > 0 else None),
        **{k: v for k, v in render_kwargs_train.items() if k not in ("H", "W")})

    def ray_loss(params, rb, key, it, surface_override=None):
        k_render, k_reg = jax.random.split(key)
        del k_reg  # reg points are jittered inside the renderer's key stream
        target_rgb = rb["target_rgb"]

        # shrinking sampling interval (traced — `it` is a device scalar)
        interval = jnp.maximum(
            delta_max * jnp.exp(-jnp.asarray(it, jnp.float32) * delta_beta),
            delta_min)

        rgb, depth_v, extras = render_fn(params, rb["rays_o"], rb["rays_d"],
                                         k_render, interval=interval,
                                         surface_override=surface_override)
        losses = {}
        losses["loss_img"] = jnp.mean(jnp.abs(rgb - target_rgb))

        if w_reg > 0:
            # nablas at (surface point, jittered neighbor), computed by the
            # renderer's single batched network query
            reg = extras["nablas_surface_reg"]
            nablas_surface = reg[..., 0, :]
            nablas_perturb = reg[..., 1, :]

            def _unit(v):
                return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)
            # normalize before regularizing — unnormalized OccNet nablas blow
            # up the gradient (ref unisurf.py:339-341)
            losses["loss_reg"] = w_reg * jnp.mean(
                (_unit(nablas_perturb) - _unit(nablas_surface)) ** 2)
        else:
            losses["loss_reg"] = jnp.asarray(0.0)

        total = sum(losses.values())
        losses["total"] = total
        extras["scalars"] = {"interval": interval}
        return total, (losses, extras)

    return ray_loss


def make_pipeline_fns(model: UNISURF, args, render_kwargs_train: dict):
    """Split the train step for software pipelining (training.overlap_sampler)
    — same contract as neus.make_pipeline_fns. The surface root-find is
    deterministic, so split == fused is exact regardless of the key."""
    sample_kwargs = {k: v for k, v in render_kwargs_train.items()
                     if k not in ("H", "W", "rayschunk")}
    ray_loss = make_ray_loss_fn(model, args, render_kwargs_train)

    def depth_sample(params, rb, key):
        surf = compute_ray_samples(model, params, rb["rays_o"], rb["rays_d"],
                                   key, **sample_kwargs)
        prefix = rb["rays_o"].shape[:-1]
        return tuple(x.reshape(prefix + x.shape[1:]) for x in surf)

    def loss_with_samples(params, rb, surf, key, it):
        return ray_loss(params, rb, key, it, surface_override=surf)

    return {"depth_sample": depth_sample,
            "loss_with_samples": loss_with_samples}


def make_trainer(model: UNISURF, args, render_kwargs_train: dict):
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
        "W_geo_feat": args.model.setdefault("W_geometry_feature", 256),
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
    model = UNISURF(surface_cfg=surface_cfg, radiance_cfg=radiance_cfg,
                    **model_config)

    render_kwargs_train = {
        "perturb": args.model.setdefault("perturb", True),
        "white_bkgd": args.model.setdefault("white_bkgd", False),
        "logit_tau": float(UNISURF.get_surface_from_opacity(args.model.tau)),
        "radius_of_interest": args.model.obj_bounding_radius,
        "N_query": args.model.setdefault("N_query", 64),
        "N_freespace": args.model.setdefault("N_freespace", 32),
        "N_steps": args.model.setdefault("N_steps", 256),
    }
    render_kwargs_test = copy.deepcopy(render_kwargs_train)
    render_kwargs_test["rayschunk"] = args.data.val_rayschunk
    render_kwargs_test["perturb"] = False

    trainer = functools.partial(make_trainer, model, args)
    return model, trainer, render_kwargs_train, render_kwargs_test, \
        functools.partial(make_volume_render_fn, model)
