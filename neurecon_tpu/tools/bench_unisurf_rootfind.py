"""On-chip A/B of the fused root-find megakernel on the UNISURF workload.

Rows: sampler alone (XLA vs megakernel, incl. on-device elementwise check)
and the full UNISURF train step both ways.
Run on TPU: python -m neurecon_tpu.tools.bench_unisurf_rootfind
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.tools.bench_fused_upsample import scan_time


def main():
    from neurecon_tpu.config import load_yaml
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.models.frameworks.unisurf import (compute_ray_samples,
                                                        get_model,
                                                        make_ray_loss_fn)
    from neurecon_tpu.training import init_train_state, make_train_step

    args = load_yaml("configs/synthetic_quality_unisurf.yaml")
    N = int(args.data.N_rays)
    model, _tf, kw, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))

    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-3.0)
    rays_d = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (N, 2)) * 0.1,
         jnp.ones((N, 1))], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sample_kwargs = {k: v for k, v in kw.items()
                     if k not in ("H", "W", "rayschunk")}

    # on-device correctness first
    outs = {}
    for env in ("0", "1"):
        os.environ["NEURECON_FUSED_ROOTFIND"] = env
        try:
            f = jax.jit(lambda p, k: compute_ray_samples(
                model, p, rays_o, rays_d, k, **sample_kwargs))
            outs[env] = [np.asarray(x)
                         for x in f(params, jax.random.PRNGKey(0))]
        finally:
            os.environ["NEURECON_FUSED_ROOTFIND"] = "0"
    if "1" in outs and "0" in outs:
        dd = np.abs(outs["0"][0] - outs["1"][0])
        mm = (outs["0"][2] != outs["1"][2]).mean()
        print(f"rootfind fused-vs-xla on-device: max|dd| {np.nanmax(np.where(np.isfinite(dd), dd, 0)):.3e} "
              f"mask mismatch {mm:.4f}", flush=True)

    for env, name in (("0", "UNISURF root-find sampler (XLA)"),
                      ("1", "UNISURF root-find sampler (megakernel)")):
        os.environ["NEURECON_FUSED_ROOTFIND"] = env
        try:
            def sampler_only(c, k):
                d, pt, m, ms = compute_ray_samples(
                    model, params, rays_o, rays_d, k, **sample_kwargs)
                return c + jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
            scan_time(sampler_only, jnp.zeros(()), K=30, name=name)
        except Exception as e:
            print(f"# {name} failed: {str(e).splitlines()[0][:140]}",
                  flush=True)
        finally:
            os.environ["NEURECON_FUSED_ROOTFIND"] = "0"

    rb = {"rays_o": rays_o, "rays_d": rays_d,
          "target_rgb": jnp.ones((N, 3)) * 0.5,
          "target_mask": jnp.ones((N,), bool)}
    rk = dict(kw)
    rk.update({"H": 100, "W": 100})
    opt = make_optimizer(args, params)
    state = init_train_state(params, opt)
    for env, name in (("0", "UNISURF full train step"),
                      ("1", "UNISURF full train step (megakernel)")):
        os.environ["NEURECON_FUSED_ROOTFIND"] = env
        try:
            ray_loss = make_ray_loss_fn(model, args, rk)
            step = make_train_step(ray_loss, opt, jit=False)
            scan_time(lambda st, k: step(st, rb, k)[0], state, K=10,
                      name=name)
        except Exception as e:
            print(f"# {name} failed: {str(e).splitlines()[0][:140]}",
                  flush=True)
        finally:
            os.environ["NEURECON_FUSED_ROOTFIND"] = "0"
    print("BENCH_UNISURF_ROOTFIND_DONE", flush=True)


if __name__ == "__main__":
    main()
