"""Standing regression probe for the TPU `lax.map` sampler divergence.

Round-3 finding (docs/methods.md, docs/probes/microchunk_bisect.py): the NeuS
official_solution upsampler returns DIFFERENT depths under `jax.lax.map` over
ray microblocks than under a plain jit of the same function — on TPU only.
The reduction (this file, self-contained: no model, no PRNG, analytic sphere
SDF) shows the mechanism — and that it is NOT a miscompile: the compiler
makes different (all individually valid) fusion/reassociation choices for
the loop body inside a `lax.map` scan than in straight-line form, and the
iterated resample loop amplifies those ulp-level float differences in the
sharp-sigmoid CDF into discrete bin jumps. Measured here: TPU map-vs-plain
frac(>1e-3) ~= 2.0e-3, CPU ~= 5.4e-4 (same mechanism, smaller magnitude),
unrolled-vs-plain exactly 0 on both. Production therefore walks microblocks
with an unrolled Python loop (`training.render_full_image
microchunk_unroll=True`) whose straight-line XLA matches the plain jit —
the only invariant a backend is actually obliged to honor.

Run it (TPU: real signal; CPU: must be clean):
    python -m neurecon_tpu.tools.probe_lax_map
bench.py runs it when NEURECON_PROBE_TPU=1 and folds the status into its JSON
line, so a toolchain update that re-breaks (or fixes) the mapped path is
caught at the next bench run, not rediscovered mid-eval.

Exit code: 0 unless the UNROLLED workaround path itself diverges from the
plain jit (that would break production renders — hard fail).
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

CHUNK, MICRO, N_COARSE, N_PER_IT, ITERS = 8192, 2048, 64, 16, 4


def _upsample(o, d):
    """The official_solution upsample loop on an analytic sphere SDF —
    structurally the production loop (neus.py:137-229), every helper inlined."""
    def query(dv):
        pts = o[..., None, :] + d[..., None, :] * dv[..., :, None]
        return jnp.linalg.norm(pts, axis=-1) - 0.7

    # near/far from the unit bounding sphere (ops/ray.py:93-129)
    mid = -jnp.sum(o * d, -1) / jnp.sum(d * d, -1)
    near, far = (mid - 1.0)[..., None], (mid + 1.0)[..., None]
    t = jnp.linspace(0.0, 1.0, N_COARSE)
    _d = near * (1 - t) + far * t
    _sdf = query(_d)
    for i in range(ITERS):
        prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
        prev_z, next_z = _d[..., :-1], _d[..., 1:]
        mid_sdf = 0.5 * (prev_sdf + next_sdf)
        dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
        dot_val = jnp.clip(jnp.minimum(
            jnp.concatenate([jnp.zeros_like(dot_val[..., :1]),
                             dot_val[..., :-1]], -1), dot_val), -10.0, 0.0)
        dist = (next_z - prev_z) * 0.5
        s = 64 * (2 ** i)
        cdf_p = jax.nn.sigmoid((mid_sdf - dot_val * dist) * s)
        cdf_n = jax.nn.sigmoid((mid_sdf + dot_val * dist) * s)
        alpha = (cdf_p - cdf_n + 1e-5) / (cdf_p + 1e-5)
        shifted = jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]),
             jnp.maximum(1.0 - alpha, 0.0) + 1e-10], -1)
        w = alpha * jnp.cumprod(shifted, -1)[..., :-1] + 1e-5
        cdf = jnp.cumsum(w / jnp.sum(w, -1, keepdims=True), -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N_PER_IT), cdf.shape[:-1] + (N_PER_IT,))
        inds = jnp.sum(cdf[..., None, :] < u[..., :, None], -1).astype(jnp.int32)
        lo, hi = jnp.maximum(inds - 1, 0), jnp.minimum(inds, cdf.shape[-1] - 1)
        cdf_b = jnp.take_along_axis(cdf, lo, -1)
        den = jnp.take_along_axis(cdf, hi, -1) - cdf_b
        tt = (u - cdf_b) / jnp.where(den < 1e-5, 1.0, den)
        bins_b = jnp.take_along_axis(_d, lo, -1)
        d_fine = bins_b + tt * (jnp.take_along_axis(_d, hi, -1) - bins_b)
        _d = jnp.sort(jnp.concatenate([_d, d_fine], -1), -1)
        _sdf = query(_d)
    return _d


def run_probe():
    rng = np.random.RandomState(0)
    th = rng.uniform(-0.35, 0.35, (CHUNK, 2)).astype(np.float32)
    d = np.stack([np.sin(th[:, 0]), np.sin(th[:, 1]) * np.cos(th[:, 0]),
                  np.cos(th[:, 1]) * np.cos(th[:, 0])], -1)
    o = np.broadcast_to(np.array([0.0, 0.0, -3.0], np.float32), d.shape)
    o, d = jnp.asarray(o), jnp.asarray(d)
    ob = o.reshape(CHUNK // MICRO, MICRO, 3)
    db = d.reshape(CHUNK // MICRO, MICRO, 3)

    plain = np.asarray(jax.jit(_upsample)(o, d))
    mapped = np.asarray(jax.jit(lambda ob, db: jax.lax.map(
        lambda b: _upsample(*b), (ob, db)))(ob, db)).reshape(plain.shape)
    unrolled = np.asarray(jax.jit(lambda ob, db: jnp.stack(
        [_upsample(ob[i], db[i]) for i in range(ob.shape[0])]))(ob, db)
    ).reshape(plain.shape)

    def frac(a, b):
        return float((np.abs(a.astype(np.float64) - b) > 1e-3).mean())

    return {"backend": jax.default_backend(),
            "map_div_frac": frac(mapped, plain),
            "unroll_div_frac": frac(unrolled, plain),
            "map_clean": frac(mapped, plain) == 0.0}


if __name__ == "__main__":
    r = run_probe()
    print(json.dumps(r))
    # the unrolled path is the production workaround — it diverging is fatal
    sys.exit(0 if r["unroll_div_frac"] == 0.0 else 1)
