"""On-chip A/B of the fused Pallas upsampler megakernel vs the XLA loop.

Rows (K-step lax.scan + dependent-scalar fetch, the honest tunnel timing):
  1. correctness: fused vs XLA d_all on-device (det + perturb), max/frac diff
  2. upsampler only, XLA loop vs megakernel
  3. full flagship train step, XLA vs megakernel (env-gated at trace time)

Run on TPU: python -m neurecon_tpu.tools.bench_fused_upsample
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, init_carry, K=20, trials=3, name=""):
    @jax.jit
    def multi(carry, key):
        def body(c, k):
            return fn(c, k), None
        keys = jax.random.split(key, K)
        c, _ = jax.lax.scan(body, carry, keys)
        return c

    c = multi(init_carry, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        c = multi(init_carry, jax.random.PRNGKey(t + 1))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best / K * 1000:8.2f} ms/iter", flush=True)
    return best / K


def main():
    from neurecon_tpu.models.frameworks.neus import (get_model,
                                                     make_ray_loss_fn,
                                                     neus_upsample)
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.training import init_train_state, make_train_step
    from __graft_entry__ import _flagship_args

    N = 512
    args, _, _ = _flagship_args(N_rays=N)
    model, _tf, kw, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))

    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-3.0)
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (N, 2)) * 0.1,
         jnp.ones((N, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.ones((N, 1)) * 2.0
    far = jnp.ones((N, 1)) * 4.0
    t = jnp.linspace(0, 1, 64)
    d_coarse = near * (1 - t) + far * t

    ups_kw = dict(upsample_algo="official_solution", N_importance=64,
                  N_upsample_iters=4, N_nograd_samples=2048,
                  fixed_s_recp=1 / 64.0)

    def d_all_env(env_val, perturb, key, dev=None):
        os.environ["NEURECON_FUSED_UPSAMPLE"] = env_val
        try:
            f = jax.jit(lambda p, k: neus_upsample(
                model, p, rays_o, rays_d, d_coarse, k, perturb=perturb,
                **ups_kw))
            if dev is None:
                return np.asarray(f(params, key))
            with jax.default_device(dev):
                return np.asarray(f(jax.device_put(params, dev),
                                    jax.device_put(key, dev)))
        finally:
            os.environ["NEURECON_FUSED_UPSAMPLE"] = "0"

    # --- 1. on-device correctness, calibrated against the CPU-f32 truth ---
    # A raw fused-vs-XLA elementwise diff is meaningless on-chip: the MXU's
    # default-precision (bf16-input) MLP queries seed ~1e-3 SDF noise that
    # the chaotic hierarchical resampler amplifies, and the TPU XLA path
    # drifts from the CPU-f32 truth by exactly as much as the kernel does
    # (measured 2026-08-18: frac>1e-4span 0.447 XLA-vs-CPU, 0.442
    # fused-vs-CPU). The meaningful check: the fused kernel is as close to
    # the CPU truth as the production XLA path itself.
    cpu_dev = jax.devices("cpu")[0]
    for perturb in (False, True):
        key = jax.random.PRNGKey(42)
        ref = d_all_env("0", perturb, key)
        got = d_all_env("1", perturb, key)
        refc = d_all_env("0", perturb, key, dev=cpu_dev)
        span = float(ref.max() - ref.min())
        fr = {}
        for tag, a, b in (("fused-vs-xla", got, ref),
                          ("xla-vs-cpu", ref, refc),
                          ("fused-vs-cpu", got, refc)):
            dd = np.abs(a - b)
            fr[tag] = (dd > 1e-4 * span).mean()
            print(f"correctness perturb={perturb} {tag:14s}: "
                  f"max {dd.max():.3e} frac>1e-4*span {fr[tag]:.4f} "
                  f"nan {int(np.isnan(a).sum())}", flush=True)
        ok = fr["fused-vs-cpu"] <= fr["xla-vs-cpu"] + 0.05
        print(f"correctness perturb={perturb}: fused as close to CPU truth "
              f"as XLA path -> {'OK' if ok else 'FAIL'}; sorted "
              f"{bool((np.diff(got, axis=-1) >= -1e-6).all())}", flush=True)

    # --- 2. upsampler only ---
    for env_val, name in (("0", "upsampler XLA loop"),
                          ("1", "upsampler megakernel")):
        os.environ["NEURECON_FUSED_UPSAMPLE"] = env_val
        try:
            def ups_only(c, k):
                d = neus_upsample(model, params, rays_o, rays_d, d_coarse, k,
                                  perturb=True, **ups_kw)
                return c + jnp.sum(d)
            scan_time(ups_only, jnp.zeros(()), K=30, name=name)
        finally:
            os.environ["NEURECON_FUSED_UPSAMPLE"] = "0"

    # --- 1b. does the megakernel survive lax.map? (the XLA upsampler is
    # miscompiled under lax.map on TPU — docs/methods.md; if the Pallas
    # form maps cleanly, eval renders can drop the unrolled workaround) ---
    try:
        from neurecon_tpu.ops.fused_upsample import fused_neus_upsample
        sgp0 = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        # [N, n_iters*n_per_iter], each 16-wide round slice ascending
        us0 = jnp.broadcast_to(jnp.tile(jnp.linspace(0.0, 1.0, 16), 4),
                               (N, 64))

        def fused_direct(o, d, dc, u):
            return fused_neus_upsample(
                model.implicit_surface, sgp0["implicit_surface"], o, d, dc,
                u, n_iters=4, n_per_iter=16, interpret=False)

        direct = np.asarray(jax.jit(fused_direct)(
            rays_o, rays_d, d_coarse, us0))

        @jax.jit
        def mapped(o, d, dc, u):
            n_blk, blk = 4, N // 4
            xs = tuple(x.reshape((n_blk, blk) + x.shape[1:])
                       for x in (o, d, dc, u))
            out = jax.lax.map(lambda t: fused_direct(*t), xs)
            return out.reshape((N,) + out.shape[2:])

        # the remote compile helper intermittently 500s on large programs
        # (service degradation, see bench.py) — retry before giving up
        for attempt in range(3):
            try:
                mp = np.asarray(mapped(rays_o, rays_d, d_coarse, us0))
                break
            except Exception:
                if attempt == 2:
                    raise
                time.sleep(20 * (attempt + 1))
        dd = np.abs(direct - mp)
        print(f"megakernel map-vs-direct: max {dd.max():.3e} "
              f"frac>1e-3 {(dd > 1e-3).mean():.4f}", flush=True)
    except Exception as e:
        print(f"# lax.map check failed: {str(e).splitlines()[0][:140]}",
              flush=True)

    # --- 2b. megakernel tile-size sweep (direct call, fixed uniforms) ---
    from neurecon_tpu.ops.fused_upsample import fused_neus_upsample
    sgp = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    for tile in (16, 32, 64):
        try:
            def fused_only(c, k, tile=tile):
                us = []
                kk = k
                for _ in range(4):
                    kk, sub = jax.random.split(kk)
                    us.append(jnp.sort(jax.random.uniform(sub, (N, 16)), -1))
                d = fused_neus_upsample(
                    model.implicit_surface, sgp["implicit_surface"],
                    rays_o, rays_d, d_coarse, jnp.concatenate(us, -1),
                    n_iters=4, n_per_iter=16, tile=tile, interpret=False)
                return c + jnp.sum(d)
            scan_time(fused_only, jnp.zeros(()), K=30,
                      name=f"megakernel direct tile={tile}")
        except Exception as e:
            print(f"# tile={tile} failed: {str(e).splitlines()[0][:140]}",
                  flush=True)

    # --- 3. full train step ---
    target = jnp.ones((N, 3)) * 0.5
    tmask = jnp.ones((N,), bool)
    rb = {"rays_o": rays_o, "rays_d": rays_d, "target_rgb": target,
          "target_mask": tmask}
    rk = dict(kw)
    rk.update({"H": 100, "W": 100})
    opt = make_optimizer(args, params)
    state = init_train_state(params, opt)
    for env_val, name in (("0", "train step XLA upsampler"),
                          ("1", "train step megakernel upsampler")):
        os.environ["NEURECON_FUSED_UPSAMPLE"] = env_val
        try:
            ray_loss = make_ray_loss_fn(model, args, rk)
            step = make_train_step(ray_loss, opt, jit=False)
            scan_time(lambda st, k: step(st, rb, k)[0], state, K=10,
                      name=name)
        finally:
            os.environ["NEURECON_FUSED_UPSAMPLE"] = "0"
    print("BENCH_FUSED_UPSAMPLE_DONE", flush=True)


if __name__ == "__main__":
    main()
