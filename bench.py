"""Benchmark: NeuS training throughput in rays/sec/chip on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the PyTorch reference trains NeuS at 512 rays/step around ~3 it/s on
an RTX 3090-class GPU (README.md:82-85, configs/neus.yaml:14), i.e. ~1.5k
rays/s/GPU with ~128 samples/ray and second-order (eikonal) gradients.

Measurement notes: the TPU here sits behind a tunnel where per-call dispatch
and block_until_ready are unreliable, so K train steps run inside ONE jitted
lax.scan and the loss scalar is fetched to host (a true sync). Best of
several trials is reported to shed tunnel warm-up artifacts.
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 1536.0  # 512 rays/step * 3 it/s (reference README)


def main():
    from neurecon_tpu.dataio.synthetic import make_synthetic_scene
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.models.frameworks.neus import get_model, make_ray_loss_fn
    from neurecon_tpu.training import (init_train_state, make_train_step,
                                       sample_ray_batch)
    from __graft_entry__ import _flagship_args

    # DTU-scan65-like geometry: full-size NeuS (D=8/W=256 SDF + D=4/W=256
    # radiance), 512 train rays/step, 64 coarse + 4x16 importance samples via
    # official_solution upsampling, eikonal (grad-of-grad) loss — the exact
    # per-step workload of configs/neus.yaml.
    N_rays = 512
    H, W = 1200, 1600
    args, _, _ = _flagship_args(N_rays=N_rays)

    model, trainer_factory, kw_train, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))
    render_kwargs = dict(kw_train)
    render_kwargs.update({"H": H, "W": W})
    ray_loss = make_ray_loss_fn(model, args, render_kwargs)
    optimizer = make_optimizer(args, params)
    state = init_train_state(params, optimizer)
    step = make_train_step(ray_loss, optimizer, jit=False)

    scene = make_synthetic_scene(n_images=1, H=H, W=W, radius=0.5, cam_radius=3.0)
    batch = {"c2w": scene["c2w"][:1], "intrinsics": scene["intrinsics"][:1],
             "rgb": scene["rgb"][:1], "object_mask": scene["object_mask"][:1]}
    rb = sample_ray_batch(jax.random.PRNGKey(0), batch, H, W, N_rays)
    rb = jax.tree_util.tree_map(jnp.asarray, rb)

    def make_multi(K):
        @jax.jit
        def multi_step(state, rb, key):
            def body(carry, k):
                st, _ = carry
                st, m = step(st, rb, k)
                return (st, m["losses"]["total"]), None
            keys = jax.random.split(key, K)
            (st, last), _ = jax.lax.scan(body, (state, jnp.zeros(())), keys)
            return st, last
        return multi_step

    # the environment's remote compile helper sometimes degrades and rejects
    # large programs (SIGILL / HTTP 500) — retry each tier with backoff, then
    # tier down the scan length until one compiles; every tier is a real
    # end-to-end measurement of the same train step
    multi_step, K = None, None
    for K_try in (20, 5, 1):
        for attempt in range(3):
            try:
                cand = make_multi(K_try)
                state, last = cand(state, rb, jax.random.PRNGKey(1))
                assert float(last) > 0  # step really trained (fetch = sync)
                multi_step, K = cand, K_try
                break
            except Exception as e:  # compile-service flake: back off, retry
                print(f"# bench: K={K_try} attempt {attempt} failed "
                      f"({str(e).splitlines()[0][:80]})", flush=True)
                time.sleep(5 * (attempt + 1))
        if multi_step is not None:
            break
    assert multi_step is not None, "all bench program sizes failed to compile"

    best_dt = float("inf")
    for trial in range(5):
        t0 = time.perf_counter()
        state, last = multi_step(state, rb, jax.random.fold_in(
            jax.random.PRNGKey(2), trial))
        _ = float(last)  # host fetch: the only reliable sync on this platform
        best_dt = min(best_dt, time.perf_counter() - t0)

    n_chips = 1  # bench runs on the single real chip
    rays_per_sec_per_chip = N_rays * K / best_dt / n_chips
    print(json.dumps({
        "metric": "NeuS train throughput (512 rays/step, 64+64 samples, eikonal)",
        "value": round(rays_per_sec_per_chip, 1),
        "unit": "rays/sec/chip",
        "vs_baseline": round(rays_per_sec_per_chip / BASELINE_RAYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
