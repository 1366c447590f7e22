"""Localize the batch-8192 TPU NaN in the NeuS upsampler (300k ckpt).

Follow-up to docs/probes/microchunk_bisect.py: the unmapped jitted sampler
at batch 8192 emitted NaN sample depths on some rays. This probe reports
WHICH rays (pixel coords, sphere-intersection geometry), whether the same
rays are finite on CPU, and how the NaN count depends on the compiled batch
shape.
"""
import pickle
import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from neurecon_tpu.config import load_yaml
from neurecon_tpu.dataio import get_data
from neurecon_tpu.models.frameworks.neus import compute_ray_samples, get_model
from neurecon_tpu.ops import get_rays

CKPT = "/root/repo/logs/long_neus_sphere/ckpts/final_00300000.pt"
CHUNK = 8192

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
W = dataset.W
print(f"image W={W} H={dataset.H}; first {CHUNK} rays = rows 0..{CHUNK//W}")


def sampler(ob, db):
    return compute_ray_samples(model, params, ob, db, key, **kw)


def nan_report(tag, d_all, o_np, d_np, base_idx=0):
    d_all = np.asarray(d_all)
    bad = np.unique(np.argwhere(~np.isfinite(d_all))[:, 0])
    print(f"[{tag}] NaN rays: {bad.size}/{d_all.shape[0]}")
    if bad.size:
        # perpendicular distance of each bad ray to the origin (unit sphere
        # at 0): grazing rays have dist ~= 1.0
        oo, dd = o_np[bad], d_np[bad]
        t = -np.sum(oo * dd, -1) / np.sum(dd * dd, -1)
        perp = np.linalg.norm(oo + t[:, None] * dd, axis=-1)
        px = (base_idx + bad) % W
        py = (base_idx + bad) // W
        print(f"  perp-dist to origin: min {perp.min():.4f} max {perp.max():.4f} "
              f"(unit sphere ⇒ graze at 1.0)")
        print(f"  pixel rows {py.min()}..{py.max()}, cols {px.min()}..{px.max()}")
        print(f"  first 10 (row,col,dist): "
              f"{[(int(py[i]), int(px[i]), round(float(perp[i]), 4)) for i in range(min(10, bad.size))]}")
    return bad


o_np, d_np = np.asarray(o), np.asarray(d)

# (1) batch-shape dependence on the default backend
for bs in (8192, 4096, 2048):
    f = jax.jit(sampler)
    outs = [f(o[i:i + bs], d[i:i + bs]) for i in range(0, CHUNK, bs)]
    d_all = np.concatenate([np.asarray(x) for x in outs], 0)
    bad = nan_report(f"tpu bs={bs}", d_all, o_np, d_np)

# (2) CPU on the same rays (full 8192 in one call)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    o_c = jax.device_put(o, cpu)
    d_c = jax.device_put(d, cpu)
    p_c = jax.tree_util.tree_map(lambda x: jax.device_put(x, cpu), params)
    k_c = jax.device_put(key, cpu)

    def sampler_cpu(ob, db):
        return compute_ray_samples(model, p_c, ob, db, k_c, **kw)

    d_cpu = jax.jit(sampler_cpu)(o_c, d_c)
nan_report("cpu bs=8192", np.asarray(d_cpu), o_np, d_np)
print("NAN_PROBE_DONE", flush=True)
