"""Bisect the TPU lax.map miscompilation of the sharp-s NeuS render.

Probe established (precision_probe.log): same params, same rays, same
program semantics — render under lax.map micro-blocks gives ~23 dB, render
without lax.map gives ~44 dB, on TPU only, NeuS-only (VolSDF fine under
lax.map). This script localizes WHERE the divergence enters:
  (1) the gradient-free hierarchical upsampler (d_all), or
  (2) the final render given IDENTICAL d_all (via d_all_override).
"""
import pickle
import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from neurecon_tpu.config import load_yaml
from neurecon_tpu.dataio import get_data
from neurecon_tpu.models.frameworks.neus import (compute_ray_samples,
                                                 get_model,
                                                 volume_render_rays)
from neurecon_tpu.ops import get_rays

CKPT = "/root/repo/logs/long_neus_sphere/ckpts/final_00300000.pt"
CHUNK, MICRO = 8192, 2048

args = load_yaml("/root/repo/configs/long_neus_sphere.yaml")
model, _t, _kt, kw_test, _f = get_model(args)
kw = {k: v for k, v in kw_test.items() if k not in ("H", "W", "rayschunk")}
dataset = get_data(args)
_, mi, gt = dataset[0]
rays_o, rays_d, _ = get_rays(jax.random.PRNGKey(0), jnp.asarray(mi["c2w"]),
                             jnp.asarray(mi["intrinsics"]), dataset.H,
                             dataset.W, N_rays=-1)
o = rays_o.reshape(-1, 3)[:CHUNK]
d = rays_d.reshape(-1, 3)[:CHUNK]
with open(CKPT, "rb") as f:
    params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f)["model"])
key = jax.random.PRNGKey(0)


def stats(name, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    diff = np.abs(a - b)
    print(f"{name}: max|D| {diff.max():.3e} mean|D| {diff.mean():.3e} "
          f"frac>1e-3 {(diff > 1e-3).mean():.4f}", flush=True)


def mapped(fn, *xs):
    n = CHUNK // MICRO
    xs_b = tuple(x.reshape((n, MICRO) + x.shape[1:]) for x in xs)

    @jax.jit
    def run(*xs_b):
        out = jax.lax.map(lambda blk: fn(*blk), xs_b)
        return jax.tree_util.tree_map(
            lambda y: y.reshape((n * MICRO,) + y.shape[2:]), out)
    return run(*xs_b)


# ---- (1) the upsampler alone ----
def sampler(ob, db):
    return compute_ray_samples(model, params, ob, db, key, **kw)

d_ref = jax.jit(sampler)(o, d)
d_map = mapped(sampler, o, d)
stats("upsampler d_all (map vs nomap)", d_ref, d_map)

# ---- (2) render given IDENTICAL d_all ----
def render_fixed(ob, db, d_all):
    ret = volume_render_rays(model, params, ob, db, key,
                             d_all_override=d_all, detailed_output=False,
                             **kw)
    return ret["rgb"]

rgb_fix_ref = jax.jit(render_fixed)(o, d, d_ref)
rgb_fix_map = mapped(render_fixed, o, d, d_ref)
stats("render w/ fixed d_all (map vs nomap)", rgb_fix_ref, rgb_fix_map)

# ---- (3) full render (sampler inside) — reproduces the A/B gap ----
def render_full(ob, db):
    ret = volume_render_rays(model, params, ob, db, key,
                             detailed_output=False, **kw)
    return ret["rgb"]

rgb_ref = jax.jit(render_full)(o, d)
rgb_map = mapped(render_full, o, d)
stats("full render (map vs nomap)", rgb_ref, rgb_map)

# ---- (4) the unrolled workaround: straight-line micro blocks ----
def unrolled(fn, *xs):
    n = CHUNK // MICRO
    xs_b = tuple(x.reshape((n, MICRO) + x.shape[1:]) for x in xs)

    @jax.jit
    def run(*xs_b):
        blocks = [fn(*(xb[i] for xb in xs_b)) for i in range(n)]
        return jax.tree_util.tree_map(
            lambda *ys: jnp.concatenate(ys, 0), *blocks)
    return run(*xs_b)

rgb_unroll = unrolled(render_full, o, d)
stats("full render (unroll vs nomap)", rgb_ref, rgb_unroll)

gt_rgb = np.asarray(gt["rgb"]).reshape(-1, 3)[:CHUNK]
for name, rgb in (("nomap", rgb_ref), ("map", rgb_map),
                  ("unroll", rgb_unroll)):
    mse = float(np.mean((np.asarray(rgb) - gt_rgb) ** 2))
    print(f"full-render {name} PSNR vs GT: {-10*np.log10(mse + 1e-12):.2f}",
          flush=True)
print("BISECT_DONE", flush=True)
