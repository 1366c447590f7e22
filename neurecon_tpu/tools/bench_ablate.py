"""Component ablation microbenchmark (dev tool): times pieces of the NeuS
train step on-device via K-step lax.scan (the only honest timing behind the
device tunnel). Run on TPU: python -m neurecon_tpu.tools.bench_ablate
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, init_carry, K=10, trials=3, name=""):
    """fn(carry, key) -> carry. Times K iterations inside one jit."""
    @jax.jit
    def multi(carry, key):
        def body(c, k):
            return fn(c, k), None
        keys = jax.random.split(key, K)
        c, _ = jax.lax.scan(body, carry, keys)
        return c

    c = multi(init_carry, jax.random.PRNGKey(0))
    _ = float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))  # sync
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        c = multi(init_carry, jax.random.PRNGKey(t + 1))
        _ = float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:50s} {best / K * 1000:8.2f} ms/iter")
    return best / K


def main():
    from neurecon_tpu.models.frameworks.neus import (get_model, make_ray_loss_fn,
                                                     neus_upsample)
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.training import init_train_state, make_train_step
    from neurecon_tpu.ops import sample_pdf
    from __graft_entry__ import _flagship_args

    N = 512
    args, _, _ = _flagship_args(N_rays=N)
    model, _tf, kw, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))

    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-3.0)
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (N, 2)) * 0.1, jnp.ones((N, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = jnp.ones((N, 3)) * 0.5
    tmask = jnp.ones((N,), bool)
    rb = {"rays_o": rays_o, "rays_d": rays_d, "target_rgb": target,
          "target_mask": tmask}

    # 1. full train step
    rk = dict(kw); rk.update({"H": 100, "W": 100})
    ray_loss = make_ray_loss_fn(model, args, rk)
    opt = make_optimizer(args, params)
    state = init_train_state(params, opt)
    step = make_train_step(ray_loss, opt, jit=False)
    scan_time(lambda st, k: step(st, rb, k)[0], state, name="full train step")

    # 2. train step, direct_use upsampler (1 sample_pdf, no 4-iter loop)
    rk2 = dict(rk); rk2["upsample_algo"] = "direct_use"
    ray_loss2 = make_ray_loss_fn(model, args, rk2)
    step2 = make_train_step(ray_loss2, opt, jit=False)
    scan_time(lambda st, k: step2(st, rb, k)[0], state, name="train step (direct_use upsample)")

    # 3. loss fwd only (no grad)
    def fwd_only(c, k):
        total, _ = ray_loss(params, rb, k, 0)
        return c + total
    scan_time(fwd_only, jnp.zeros(()), name="loss forward only (with upsampler)")

    # 4. upsampler only
    near = jnp.ones((N, 1)) * 2.0; far = jnp.ones((N, 1)) * 4.0
    t = jnp.linspace(0, 1, 64)
    d_coarse = near * (1 - t) + far * t
    def ups_only(c, k):
        d = neus_upsample(model, params, rays_o, rays_d, d_coarse, k,
                          upsample_algo="official_solution", N_importance=64,
                          N_upsample_iters=4, N_nograd_samples=2048,
                          fixed_s_recp=1 / 64.0, perturb=True)
        return c + jnp.sum(d)
    scan_time(ups_only, jnp.zeros(()), name="upsampler only")

    # 5. forward_with_nablas on [N, 128] + grad wrt params
    pts = jax.random.normal(jax.random.PRNGKey(2), (N, 128, 3)) * 0.5
    def nab_loss(p):
        sdf, nab, h = model.forward_with_nablas(p, pts)
        return jnp.mean((jnp.linalg.norm(nab, axis=-1) - 1) ** 2) + jnp.mean(sdf ** 2)
    g = jax.grad(nab_loss)
    def nab_only(c, k):
        gr = g(params)
        return c + jax.tree_util.tree_leaves(gr)[0].sum()
    scan_time(nab_only, jnp.zeros(()), name="grad(sdf+nablas+eikonal) [512,128]")

    # 6. plain sdf forward on [N, 128]
    def sdf_only(c, k):
        return c + jnp.sum(model.forward_surface(params, pts))
    scan_time(sdf_only, jnp.zeros(()), name="sdf forward [512,128]")

    # 7. radiance (incl. its own nablas) on [N, 127]
    pts_m = pts[:, :127]
    views = jnp.broadcast_to(rays_d[:, None, :], pts_m.shape)
    def rad_only(c, k):
        return c + jnp.sum(model.forward_radiance(params, pts_m, views))
    scan_time(rad_only, jnp.zeros(()), name="radiance fwd (with nablas) [512,127]")

    # 8. sample_pdf alone
    bins = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (N, 64)), -1)
    w = jax.random.uniform(jax.random.PRNGKey(4), (N, 63))
    def spdf(c, k):
        return c + jnp.sum(sample_pdf(k, bins, w, 16, det=False))
    scan_time(spdf, jnp.zeros(()), name="sample_pdf 512x64->16")

    # 9. sort+gather of [512, 128]
    d = jax.random.uniform(jax.random.PRNGKey(5), (N, 128))
    def srt(c, k):
        idx = jnp.argsort(d + c, axis=-1)
        return c + jnp.sum(jnp.take_along_axis(d, idx, axis=-1)[:, 0])
    scan_time(srt, jnp.zeros(()), name="argsort+gather [512,128]")


if __name__ == "__main__":
    main()
