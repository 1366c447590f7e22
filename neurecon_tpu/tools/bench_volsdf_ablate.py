"""Where do VolSDF's ~47 ms/step go? K-scan component timings on-chip.

Rows: full train step / fine_sample alone / loss forward only / forward
with a precomputed fine_override (renderer without the sampler) / the
10-step beta bisection alone. Decides whether a fine_sample megakernel
(the VolSDF analogue of ops/fused_upsample.py) is worth building.

Run on TPU: python -m neurecon_tpu.tools.bench_volsdf_ablate
"""
import time

import jax
import jax.numpy as jnp

from neurecon_tpu.tools.bench_fused_upsample import scan_time


def main():
    from neurecon_tpu.config import load_yaml
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.models.frameworks.volsdf import (
        compute_ray_samples, error_bound, get_model, make_ray_loss_fn,
        make_pipeline_fns)
    from neurecon_tpu.training import init_train_state, make_train_step

    args = load_yaml("configs/long_volsdf_sphere.yaml")
    N = int(args.data.N_rays)
    model, _tf, kw, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))

    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-3.0)
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (N, 2)) * 0.1,
         jnp.ones((N, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rb = {"rays_o": rays_o, "rays_d": rays_d,
          "target_rgb": jnp.ones((N, 3)) * 0.5}

    import os

    rk = dict(kw)
    rk.update({"H": 100, "W": 100})
    opt = make_optimizer(args, params)
    state = init_train_state(params, opt)
    for env, name in (("0", "VolSDF full train step"),
                      ("1", "VolSDF full train step (fused fine_sample)")):
        os.environ["NEURECON_FUSED_FINESAMPLE"] = env
        try:
            ray_loss = make_ray_loss_fn(model, args, rk)
            step = make_train_step(ray_loss, opt, jit=False)
            scan_time(lambda st, k: step(st, rb, k)[0], state, K=10,
                      name=name)
        except Exception as e:
            print(f"# {name} failed: {str(e).splitlines()[0][:140]}",
                  flush=True)
        finally:
            os.environ["NEURECON_FUSED_FINESAMPLE"] = "0"
    ray_loss = make_ray_loss_fn(model, args, rk)

    pipe = make_pipeline_fns(model, args, rk)
    sample_kwargs = {k: v for k, v in rk.items()
                     if k not in ("H", "W", "rayschunk")}

    def sampler_only(c, k):
        fine, beta_map, iu = compute_ray_samples(
            model, params, rays_o, rays_d, k, **sample_kwargs)
        return c + jnp.sum(fine) + jnp.sum(beta_map)
    scan_time(sampler_only, jnp.zeros(()), K=20, name="fine_sample alone")

    for env in ("1",):
        os.environ["NEURECON_FUSED_FINESAMPLE"] = env
        try:
            scan_time(sampler_only, jnp.zeros(()), K=20,
                      name="fine_sample alone (megakernel)")
        except Exception as e:
            print(f"# fused fine_sample failed: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
        finally:
            os.environ["NEURECON_FUSED_FINESAMPLE"] = "0"

    def fwd_only(c, k):
        total, _ = ray_loss(params, rb, k, 0)
        return c + total
    scan_time(fwd_only, jnp.zeros(()), K=20, name="loss forward (incl sampler)")

    fine0 = pipe["depth_sample"](params, rb, jax.random.PRNGKey(3))

    def fwd_override(c, k):
        total, _ = pipe["loss_with_samples"](params, rb, fine0, k, 0)
        return c + total
    scan_time(fwd_override, jnp.zeros(()), K=20,
              name="loss forward (fine_override, no sampler)")

    def step_override(st, k):
        # grad+adam with the sampler amputated: the fine_sample-free step
        import optax
        g = jax.grad(lambda p: pipe["loss_with_samples"](p, rb, fine0, k, 0)[0])(
            st.params)
        upd, opt_state = opt.update(g, st.opt_state, st.params)
        return st._replace(params=optax.apply_updates(st.params, upd),
                           opt_state=opt_state, step=st.step + 1)
    scan_time(step_override, state, K=10,
              name="train step (fine_override, no sampler)")

    # bisection cost in isolation: 10 halvings x error_bound over [N, S]
    S = 768
    d_vals = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (N, S),
                                         minval=0.5, maxval=5.5), axis=-1)
    sdf = jax.random.normal(jax.random.PRNGKey(5), (N, S)) * 0.3
    beta0 = jnp.full((N, 1), 0.5)

    def bisect_only(c, k):
        bl = jnp.full_like(beta0, 1e-3)
        br = beta0
        for _ in range(10):
            bt = 0.5 * (bl + br)
            bm = jnp.max(error_bound(d_vals, sdf, 1.0 / bt, bt), -1,
                         keepdims=True)
            good = bm <= 0.1
            br = jnp.where(good, bt, br)
            bl = jnp.where(good, bl, bt)
        return c + jnp.sum(br)
    scan_time(bisect_only, jnp.zeros(()), K=20,
              name=f"10-step beta bisection alone [N,{S}]")
    print("BENCH_VOLSDF_ABLATE_DONE", flush=True)


if __name__ == "__main__":
    main()
