"""Shrink the TPU lax.map upsampler miscompile toward a minimal repro.

Established (docs/probes/microchunk_bisect.py): the NeuS official_solution
upsampler's output d_all diverges (46% of entries >1e-3) between a plain
jit and the same function under jax.lax.map over 2048-ray blocks, on TPU,
with the trained 300k MLP. This script swaps pieces out one at a time,
smallest first, everything deterministic (perturb=False -> det sampling,
no PRNG anywhere).

Each variant prints TPU map-vs-nomap divergence AND TPU-nomap-vs-CPU truth.
"""
import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from neurecon_tpu.models.frameworks.neus import (alpha_to_w, cdf_Phi_s)
from neurecon_tpu.ops.sampling import sample_pdf
from neurecon_tpu.ops.ray import near_far_from_sphere

CHUNK, MICRO = 8192, 2048

# production-shaped rays: camera at z=-3 looking +z, small fov grid
rng = np.random.RandomState(0)
th = rng.uniform(-0.35, 0.35, (CHUNK, 2)).astype(np.float32)
d = np.stack([np.sin(th[:, 0]), np.sin(th[:, 1]) * np.cos(th[:, 0]),
              np.cos(th[:, 1]) * np.cos(th[:, 0])], -1)
o = np.broadcast_to(np.array([0.0, 0.0, -3.0], np.float32), d.shape)
o_j, d_j = jnp.asarray(o), jnp.asarray(d)


def mapped(fn, *xs):
    n = xs[0].shape[0] // MICRO
    xs_b = tuple(x.reshape((n, MICRO) + x.shape[1:]) for x in xs)

    @jax.jit
    def run(*xs_b):
        out = jax.lax.map(lambda blk: fn(*blk), xs_b)
        return jax.tree_util.tree_map(
            lambda y: y.reshape((n * MICRO,) + y.shape[2:]), out)
    return run(*xs_b)


def compare(name, fn, *xs):
    ref = np.asarray(jax.jit(fn)(*xs))
    mp = np.asarray(mapped(fn, *xs))
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        xs_c = tuple(jax.device_put(np.asarray(x), cpu_dev) for x in xs)
        cpu = np.asarray(jax.jit(fn)(*xs_c))
    for tag, a, b in (("map-vs-nomap[tpu]", mp, ref),
                      ("nomap[tpu]-vs-cpu", ref, cpu)):
        dd = np.abs(a.astype(np.float64) - b.astype(np.float64))
        print(f"{name:42s} {tag}: max {np.nanmax(dd):.3e} "
              f"frac>1e-3 {(dd > 1e-3).mean():.4f} "
              f"nan {int((~np.isfinite(a)).sum())}", flush=True)


def sphere_sdf(pts, r=0.7):
    return jnp.linalg.norm(pts, axis=-1) - r


def upsample_loop(ob, db, query, iters=4, n_per_iter=16, n_coarse=64):
    near, far = near_far_from_sphere(ob, db, r=1.0)
    t = jnp.linspace(0.0, 1.0, n_coarse)
    _d = near * (1 - t) + far * t
    _sdf = query(ob, db, _d)
    for i in range(iters):
        prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
        prev_z, next_z = _d[..., :-1], _d[..., 1:]
        mid_sdf = 0.5 * (prev_sdf + next_sdf)
        dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
        prev_dot_val = jnp.concatenate(
            [jnp.zeros_like(dot_val[..., :1]), dot_val[..., :-1]], axis=-1)
        dot_val = jnp.clip(jnp.minimum(prev_dot_val, dot_val), -10.0, 0.0)
        dist = next_z - prev_z
        prev_esti = mid_sdf - dot_val * dist * 0.5
        next_esti = mid_sdf + dot_val * dist * 0.5
        s = 64 * (2 ** i)
        alpha = (cdf_Phi_s(prev_esti, s) - cdf_Phi_s(next_esti, s) + 1e-5) \
            / (cdf_Phi_s(prev_esti, s) + 1e-5)
        _w = alpha_to_w(alpha)
        d_fine = sample_pdf(None, _d, _w, n_per_iter, det=True)
        sdf_fine = query(ob, db, d_fine)
        _d = jnp.concatenate([_d, d_fine], axis=-1)
        _sdf = jnp.concatenate([_sdf, sdf_fine], axis=-1)
        idx = jnp.argsort(_d, axis=-1)
        _d = jnp.take_along_axis(_d, idx, axis=-1)
        _sdf = jnp.take_along_axis(_sdf, idx, axis=-1)
    return _d


def q_analytic(ob, db, dv):
    pts = ob[..., None, :] + db[..., None, :] * dv[..., :, None]
    return sphere_sdf(pts)


# V1: full 4-iter loop, analytic SDF (no MLP at all)
compare("V1 loop x4 (analytic sdf)",
        lambda ob, db: upsample_loop(ob, db, q_analytic), o_j, d_j)

# V2: single iteration
compare("V2 loop x1 (analytic sdf)",
        lambda ob, db: upsample_loop(ob, db, q_analytic, iters=1), o_j, d_j)

# V3: sample_pdf alone, det, production-ish bins/weights
bins = np.sort(rng.uniform(2.0, 4.0, (CHUNK, 64)).astype(np.float32), -1)
w = rng.uniform(0.0, 1.0, (CHUNK, 63)).astype(np.float32) ** 4
compare("V3 sample_pdf det (64 bins -> 16)",
        lambda b_, w_: sample_pdf(None, b_, w_, 16, det=True),
        jnp.asarray(bins), jnp.asarray(w))

# V4: concat + argsort + take_along_axis alone
ext = rng.uniform(2.0, 4.0, (CHUNK, 16)).astype(np.float32)


def sort_merge(b_, e_):
    m = jnp.concatenate([b_, e_], axis=-1)
    idx = jnp.argsort(m, axis=-1)
    return jnp.take_along_axis(m, idx, axis=-1)

compare("V4 concat+argsort+take",
        sort_merge, jnp.asarray(bins), jnp.asarray(ext))
print("MINI_REPRO_DONE", flush=True)
