"""Analytic sphere scene — a file-free dataset for tests and benchmarks.

Cameras on a ring looking at the origin; images rendered analytically from a
lambertian sphere SDF, so ground-truth depth / normals / masks are exact.
Shares the SceneDataset interface of the real loaders (dataio/DTU.py:9-160):
preloaded host arrays, `__getitem__` -> (idx, model_input, ground_truth).
"""
from __future__ import annotations

import numpy as np

from neurecon_tpu.utils.camera import look_at


def _ray_sphere(rays_o, rays_d, radius):
    """Analytic first-hit of |x| = radius. Returns (hit_mask, depth, normal)."""
    b = np.sum(rays_o * rays_d, axis=-1)
    c = np.sum(rays_o ** 2, axis=-1) - radius ** 2
    disc = b ** 2 - c
    hit = disc > 0
    sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
    t = -b - sqrt_disc
    hit = hit & (t > 0)
    pts = rays_o + t[..., None] * rays_d
    normal = pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-10)
    return hit, t, normal


def render_sphere_views(c2w_all, intrinsics, H, W, radius=0.5,
                        light_dir=(0.5, -0.7, -0.5), albedo=(0.8, 0.3, 0.25)):
    """Render [n, H*W, 3] lambertian images + [n, H*W] masks + [n, H*W] depth."""
    light = np.asarray(light_dir, np.float64)
    light = light / np.linalg.norm(light)
    albedo = np.asarray(albedo, np.float64)

    jj, ii = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x_cam = (ii - cx) / fx
    y_cam = (jj - cy) / fy
    dirs_cam = np.stack([x_cam, y_cam, np.ones_like(x_cam)], axis=-1).reshape(-1, 3)

    rgbs, masks, depths = [], [], []
    for c2w in c2w_all:
        R, o = c2w[:3, :3], c2w[:3, 3]
        dirs = dirs_cam @ R.T
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        rays_o = np.broadcast_to(o, dirs.shape)
        hit, t, normal = _ray_sphere(rays_o, dirs, radius)
        lambert = np.clip(np.sum(normal * (-light), axis=-1), 0.0, 1.0)
        shade = (0.25 + 0.75 * lambert)[..., None] * albedo
        rgb = np.where(hit[..., None], shade, 0.0)
        rgbs.append(rgb.astype(np.float32))
        masks.append(hit)
        depths.append(np.where(hit, t, 0.0).astype(np.float32))
    return np.stack(rgbs), np.stack(masks), np.stack(depths)


def make_synthetic_scene(n_images=16, H=120, W=160, radius=0.5, cam_radius=3.0,
                         focal_factor=1.2):
    """Returns a dict of host numpy arrays describing the full scene."""
    c2w_all = []
    for k in range(n_images):
        theta = 2 * np.pi * k / n_images
        phi = 0.35 * np.sin(3 * theta)  # slight elevation variation
        loc = cam_radius * np.array([
            np.cos(theta) * np.cos(phi), np.sin(phi), np.sin(theta) * np.cos(phi)])
        c2w_all.append(look_at(loc, np.zeros(3)).astype(np.float32))
    c2w_all = np.stack(c2w_all)

    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = focal_factor * max(H, W)
    intr[0, 2], intr[1, 2] = W / 2.0, H / 2.0

    rgb, mask, depth = render_sphere_views(c2w_all, intr, H, W, radius=radius)
    return {
        "c2w": c2w_all,                                   # [n, 4, 4]
        "intrinsics": np.repeat(intr[None], n_images, 0),  # [n, 4, 4]
        "rgb": rgb,                                        # [n, H*W, 3]
        "object_mask": mask,                               # [n, H*W] bool
        "depth": depth,                                    # [n, H*W]
        "H": H, "W": W, "radius": radius,
    }


class SceneDataset:
    """Dataset-protocol wrapper over the analytic scene."""

    def __init__(self, data_dir=None, downscale=1.0, scale_radius=-1,
                 n_images=16, H=120, W=160, radius=0.5, cam_radius=3.0):
        H, W = int(H // downscale), int(W // downscale)
        # scale_radius semantics match the real loaders (max camera norm ends
        # up at scale_radius/1.1) — but the scene is analytic, so cameras are
        # PLACED at the scaled radius before rendering (scaling poses after
        # rendering would desynchronize images from geometry).
        if scale_radius > 0:
            cam_radius = scale_radius / 1.1
        scene = make_synthetic_scene(n_images=n_images, H=H, W=W, radius=radius,
                                     cam_radius=cam_radius)
        self.H, self.W = H, W
        self.n_images = n_images
        self.c2w_all = scene["c2w"]
        self.intrinsics_all = scene["intrinsics"]
        self.rgb_images = scene["rgb"]
        self.object_masks = scene["object_mask"]
        self.depths = scene["depth"]

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {
            "object_mask": self.object_masks[idx],
            "intrinsics": self.intrinsics_all[idx],
            "c2w": self.c2w_all[idx],
        }
        ground_truth = {"rgb": self.rgb_images[idx]}
        return idx, sample, ground_truth
