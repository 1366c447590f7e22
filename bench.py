"""Benchmark: training throughput of ALL THREE frameworks + the render path.

Prints ONE JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The flagship NeuS train row prints LAST.

Baselines:
  * train: the PyTorch reference trains 512 rays/step around ~3 it/s on an
    RTX 3090-class GPU (ref README.md:82-85, configs/neus.yaml:14), i.e.
    ~1.5k rays/s/GPU with ~128 samples/ray and second-order (eikonal)
    gradients. The same derived number is used for all three frameworks
    (the reference publishes only the one training-speed figure).
  * render: the reference renders 60 NeuS volume-rendered frames @360x400
    in 28 min = 28 s/frame (ref docs/usage.md:270-275).

Measurement notes: the TPU here sits behind a tunnel where per-call dispatch
and block_until_ready are unreliable, so K train steps run inside ONE jitted
lax.scan and a dependent scalar is fetched to host (a true sync). Best of
several trials is reported to shed tunnel warm-up artifacts.
"""
import json
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 1536.0   # 512 rays/step * 3 it/s (reference README)
BASELINE_RENDER_S_PER_FRAME = 28.0  # 28 min / 60 frames @360x400 (ref usage.md)
BASELINE_SURFACE_S_PER_FRAME = 0.3  # 18 s / 60 frames, sphere tracing (ditto)


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 1), "unit": unit,
                      "vs_baseline": round(vs_baseline, 2)}), flush=True)


def _measure_train(args, H, W, label):
    """Build a framework's full train step from `args`, run K steps per
    dispatch, return best-of-5 rays/sec."""
    from neurecon_tpu.dataio.synthetic import make_synthetic_scene
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.models.frameworks import get_model, get_ray_loss_fn
    from neurecon_tpu.training import (init_train_state, make_train_step,
                                       sample_ray_batch)

    N_rays = int(args.data.N_rays)
    model, _, kw_train, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))
    render_kwargs = dict(kw_train)
    render_kwargs.update({"H": H, "W": W})
    ray_loss = get_ray_loss_fn(args, model, render_kwargs)
    optimizer = make_optimizer(args, params)
    state = init_train_state(params, optimizer)
    step = make_train_step(ray_loss, optimizer, jit=False)

    scene = make_synthetic_scene(n_images=1, H=H, W=W, radius=0.5,
                                 cam_radius=3.0)
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
                print(f"# bench[{label}]: K={K_try} attempt {attempt} failed "
                      f"({str(e).splitlines()[0][:80]})", flush=True)
                time.sleep(5 * (attempt + 1))
        if multi_step is not None:
            break
    assert multi_step is not None, f"all {label} program sizes failed to compile"

    best_dt = float("inf")
    for trial in range(5):
        t0 = time.perf_counter()
        state, last = multi_step(state, rb, jax.random.fold_in(
            jax.random.PRNGKey(2), trial))
        _ = float(last)  # host fetch: the only reliable sync on this platform
        best_dt = min(best_dt, time.perf_counter() - t0)
    return N_rays * K / best_dt


def bench_neus_xla():
    """DTU-scan65-like geometry: full-size NeuS (D=8/W=256 SDF + D=4/W=256
    radiance), 512 train rays/step, 64 coarse + 4x16 importance samples via
    official_solution upsampling, eikonal (grad-of-grad) loss — the exact
    per-step workload of configs/neus.yaml, with the plain XLA upsampler
    (training.fused_samplers: false)."""
    return _with_env("NEURECON_FUSED_UPSAMPLE", _bench_neus_xla_inner,
                     value="0")()


def _bench_neus_xla_inner():
    from __graft_entry__ import _flagship_args
    args, _, _ = _flagship_args(N_rays=512)
    return _measure_train(args, 1200, 1600, "NeuS")


def bench_neus_flagship():
    """The configs/neus.yaml production path: same workload as
    bench_neus_xla but with training.fused_samplers AND
    training.fused_nablas_vjp (the defaults the config ships) — the
    hierarchical upsampler runs as the Pallas megakernel
    (ops/fused_upsample.py, 2.14x the XLA loop on v5e) and the step's
    dominant eikonal grad-of-grad block runs through the custom-VJP fused
    nablas pair (ops/fused_nablas_vjp.py, 2.2x the XLA grad block on v5e:
    6.30 vs 13.83 ms per 65536-point rep, tile sweep 2026-08-19)."""
    return _with_env(
        "NEURECON_FUSED_UPSAMPLE",
        _with_env("NEURECON_FUSED_NABLAS_VJP", _bench_neus_xla_inner))()


def bench_neus_pipelined():
    """Flagship NeuS through the PRODUCTION block path (on-device ray
    sampling + scan) with training.overlap_sampler: the no-grad upsampler of
    step i+1 overlaps step i's backward (parallel/sharding.py pipelined
    body). Same per-step math; sample placement one step stale."""
    from __graft_entry__ import _flagship_args
    args, _, _ = _flagship_args(N_rays=512)
    return _measure_pipelined(args, 1200, 1600, "NeuS-pipelined")


def _measure_pipelined(args, H, W, label):
    from neurecon_tpu.dataio.synthetic import make_synthetic_scene
    from neurecon_tpu.models.base import make_optimizer
    from neurecon_tpu.models.frameworks import (get_model, get_pipeline_fns,
                                                get_ray_loss_fn)
    from neurecon_tpu.parallel import make_mesh
    from neurecon_tpu.parallel.sharding import make_sharded_train_block
    from neurecon_tpu.training import init_train_state, sample_ray_batch

    N_rays = int(args.data.N_rays)
    model, _, kw_train, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))
    rk = dict(kw_train)
    rk.update({"H": H, "W": W})
    ray_loss = get_ray_loss_fn(args, model, rk)
    pipe = get_pipeline_fns(args, model, rk)
    optimizer = make_optimizer(args, params)
    state = init_train_state(params, optimizer)

    scene = make_synthetic_scene(n_images=1, H=H, W=W, radius=0.5,
                                 cam_radius=3.0)
    data = {k: jnp.asarray(scene[k][:1])
            for k in ("c2w", "intrinsics", "rgb", "object_mask")}

    def sample_fn(d, idx, key):
        sliced = {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                  for k, v in d.items()}
        return sample_ray_batch(key, sliced, H, W, N_rays)

    mesh = make_mesh()
    block = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                     pipeline_fns=pipe)

    block_ok, K = None, None
    for K_try in (20, 5, 1):
        idxs = jnp.zeros((K_try,), jnp.int32)
        for attempt in range(3):
            try:
                state, m = block(state, data, idxs, jax.random.PRNGKey(1))
                assert float(m["losses"]["total"]) > 0
                block_ok, K = block, K_try
                break
            except Exception as e:
                print(f"# bench[{label}]: K={K_try} attempt {attempt} "
                      f"failed ({str(e).splitlines()[0][:80]})", flush=True)
                time.sleep(5 * (attempt + 1))
        if block_ok is not None:
            break
    assert block_ok is not None, "pipelined block failed to compile"

    idxs = jnp.zeros((K,), jnp.int32)
    best_dt = float("inf")
    for trial in range(5):
        t0 = time.perf_counter()
        state, m = block_ok(state, data, idxs,
                            jax.random.fold_in(jax.random.PRNGKey(2), trial))
        _ = float(m["losses"]["total"])  # host fetch: the only reliable sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    return N_rays * K / best_dt


def _quality_args(config_name):
    from neurecon_tpu.config import load_yaml
    args = load_yaml(f"configs/{config_name}")
    return args, int(args.data.H), int(args.data.W)


def bench_volsdf():
    """Full-size VolSDF (D=8/W=256 SDF, error-bound fine_sample with the
    10-step beta bisection, 128 coarse + 64 fine samples) — the per-step
    workload of configs/volsdf.yaml."""
    args, H, W = _quality_args("synthetic_quality_volsdf.yaml")
    return _measure_train(args, H, W, "VolSDF")


def _with_env(var, fn, value="1"):
    """Run fn with os.environ[var]=value, restoring the caller's original
    value (or absence) afterwards — a caller running with
    NEURECON_FUSED_UPSAMPLE=interpret must not have it clobbered."""
    import os

    def wrapped():
        prior = os.environ.get(var)
        os.environ[var] = value
        try:
            return fn()
        finally:
            if prior is None:
                del os.environ[var]
            else:
                os.environ[var] = prior
    return wrapped


def bench_volsdf_fused():
    """The configs/volsdf.yaml production path: the fused fine-sample kernel
    family (ops/fused_fine_sample.py, NEURECON_FUSED_FINESAMPLE=1 — upsample
    + MLP re-query and checkpoint + beta-bisection as Pallas kernels with the
    surface weights VMEM-resident, 2.30x the XLA step on v5e) plus the
    custom-VJP fused nablas kernel (ops/fused_nablas_vjp.py,
    +24% on top: 20.8k -> 25.8k rays/s, 2026-08-19)."""
    return _with_env(
        "NEURECON_FUSED_FINESAMPLE",
        _with_env("NEURECON_FUSED_NABLAS_VJP", bench_volsdf))()


def bench_neus_pipelined_fused():
    """overlap_sampler AND the full production kernel set (fused upsampler
    megakernel + custom-VJP nablas) together — the no-grad megakernel
    sampler of step i+1 overlaps step i's backward (composition tested:
    tests/test_fused_upsample.py). Directly comparable to the flagship row:
    the delta is what pipelining buys on top of the production kernels."""
    return _with_env(
        "NEURECON_FUSED_UPSAMPLE",
        _with_env("NEURECON_FUSED_NABLAS_VJP", bench_neus_pipelined))()


def bench_volsdf_pipelined():
    """VolSDF through the pipelined block: fine_sample (40%+ of the VolSDF
    step, all no-grad) for step i+1 overlaps step i's backward — the
    framework where overlap has the most sampler time to hide (VERDICT r3
    #3: 'try VolSDF first'). XLA sampler path."""
    args, H, W = _quality_args("synthetic_quality_volsdf.yaml")
    return _measure_pipelined(args, H, W, "VolSDF-pipelined")


def bench_volsdf_pipelined_fused():
    """overlap_sampler AND the full production kernel set (fused fine-sample
    family + custom-VJP nablas) together."""
    return _with_env(
        "NEURECON_FUSED_FINESAMPLE",
        _with_env("NEURECON_FUSED_NABLAS_VJP", bench_volsdf_pipelined))()


def bench_unisurf():
    """Full-size UNISURF (root-finding caster + 8-step secant, 64 interval +
    32 freespace samples, normal-smoothness reg) — the per-step workload of
    configs/unisurf.yaml, plain XLA."""
    args, H, W = _quality_args("synthetic_quality_unisurf.yaml")
    return _measure_train(args, H, W, "UNISURF")


def bench_unisurf_fused():
    """The configs/unisurf.yaml production path: same workload through the
    custom-VJP fused nablas kernel (UNISURF has no sampler megakernel — its
    root-find kernel measured neutral, docs/round3.md). Measured 1.39x on
    v5e: 37.2k -> 51.9k rays/s (2026-08-19)."""
    return _with_env("NEURECON_FUSED_NABLAS_VJP", bench_unisurf)()


def bench_render(cull: bool = False):
    """Volume-render one full 360x400 NeuS frame (rgb+depth+normals) through
    render_full_image — the tools/render_view.py workload at the reference's
    published resolution (ref docs/usage.md:270-275). cull=True adds the
    host-side bounding-sphere ray culling (render_view --cull_miss): same
    image up to the <5e-3 background residual (tested), only hitting rays
    touch the network."""
    from neurecon_tpu.training import render_full_image
    from neurecon_tpu.models.frameworks.neus import get_model
    from neurecon_tpu.ops import get_rays_at
    from __graft_entry__ import _flagship_args

    args, _, _ = _flagship_args(N_rays=512)
    model, _, kw_train, _, render_factory = get_model(args)
    params = model.init(jax.random.PRNGKey(0))
    render = render_factory(detailed_output=False, calc_normal=True,
                            **kw_train)

    H, W = 360, 400
    c2w = jnp.eye(4).at[2, 3].set(-3.0)
    intr = jnp.eye(4).at[0, 0].set(500.0).at[1, 1].set(500.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)
    rays_o, rays_d = get_rays_at(jnp.arange(H * W), c2w, intr, H, W)

    best = float("inf")
    for trial in range(3):  # trial 0 pays the compile; best-of discards it
        t0 = time.perf_counter()
        # microchunk_unroll: the TPU-safe micro-block mode (the lax.map one
        # miscompiles sharp-s NeuS — docs/methods.md); bench the path users
        # are told to use
        render_full_image(render, params, rays_o, rays_d,
                          jax.random.PRNGKey(trial), rayschunk=18000,
                          microchunk=2250, microchunk_unroll=True,
                          cull_sphere_r=1.0 if cull else None)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_render_surface():
    """Surface-render one 360x400 NeuS frame (sphere tracing + single
    radiance query + normals) — the reference's '~100x faster' eval path
    (18 s / 60 frames on a 3090, ref docs/usage.md:255,270-275)."""
    from neurecon_tpu.models.frameworks.neus import get_model
    from neurecon_tpu.models.ray_casting import make_surface_render_fn
    from neurecon_tpu.ops import get_rays_at
    from __graft_entry__ import _flagship_args

    args, _, _ = _flagship_args(N_rays=512)
    model, _, _, _, _ = get_model(args)
    params = model.init(jax.random.PRNGKey(0))
    render = make_surface_render_fn(
        model, ray_casting_algo="sphere_tracing",
        ray_casting_cfgs={"near": 0.0, "far": 1.2 * (3.0 + 1.0)})

    H, W = 360, 400
    c2w = jnp.eye(4).at[2, 3].set(-3.0)
    intr = jnp.eye(4).at[0, 0].set(500.0).at[1, 1].set(500.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)
    rays_o, rays_d = get_rays_at(jnp.arange(H * W), c2w, intr, H, W)
    jrender = jax.jit(lambda p, o, d: render(p, o, d, jax.random.PRNGKey(0)))

    best = float("inf")
    for trial in range(3):  # trial 0 pays the compile; best-of discards it
        t0 = time.perf_counter()
        rgb, depth, extras = jrender(params, rays_o, rays_d)
        _ = float(jnp.sum(depth))  # host fetch: the only reliable sync
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    # Fail fast and legibly when the device tunnel is down: backend init
    # normally takes 60-200 s here, but during an outage jax.devices()
    # hangs for hours before raising UNAVAILABLE (observed 2026-08-17).
    import os
    import signal

    def _init_timeout(_sig, _frm):
        print("# bench: TPU backend init exceeded 600 s — device tunnel "
              "down/unreachable; no numbers can be measured", flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _init_timeout)
    signal.alarm(600)
    jax.devices()
    signal.alarm(0)

    results = []

    for name, fn in (("VolSDF", bench_volsdf),
                     ("VolSDF-fused", bench_volsdf_fused),
                     ("UNISURF", bench_unisurf),
                     ("UNISURF-fused", bench_unisurf_fused),
                     ("NeuS-XLA", bench_neus_xla),
                     ("NeuS-pipelined-fused", bench_neus_pipelined_fused)):
        try:
            rps = fn()
            results.append((
                f"{name} train throughput (512 rays/step, full sampler, "
                f"full losses)", rps, "rays/sec/chip",
                rps / BASELINE_RAYS_PER_SEC))
        except Exception as e:
            print(f"# bench[{name}] failed: {str(e).splitlines()[0][:120]}",
                  flush=True)

    try:
        spf = bench_render()
        results.append((
            "NeuS full-frame volume render 360x400 (rgb+depth+normals)",
            spf, "sec/frame", BASELINE_RENDER_S_PER_FRAME / spf))
    except Exception as e:
        print(f"# bench[render] failed: {str(e).splitlines()[0][:120]}",
              flush=True)

    try:
        spf = bench_render(cull=True)
        results.append((
            "NeuS full-frame volume render 360x400 + miss-ray culling",
            spf, "sec/frame", BASELINE_RENDER_S_PER_FRAME / spf))
    except Exception as e:
        print(f"# bench[render+cull] failed: {str(e).splitlines()[0][:120]}",
              flush=True)

    try:
        spf = bench_render_surface()
        results.append((
            "NeuS full-frame surface render 360x400 (sphere tracing)",
            spf, "sec/frame", BASELINE_SURFACE_S_PER_FRAME / spf))
    except Exception as e:
        print(f"# bench[render-surface] failed: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # standing toolchain probe (VERDICT r3 #5): opt-in via NEURECON_PROBE_TPU
    # so a compiler update that re-breaks (or fixes) the mapped render path
    # is caught at the next bench run, not rediscovered mid-eval.
    if os.environ.get("NEURECON_PROBE_TPU", "0") == "1":
        try:
            from neurecon_tpu.tools.probe_lax_map import run_probe
            r = run_probe()
            print(f"# probe[lax_map] backend={r['backend']} "
                  f"map_div_frac={r['map_div_frac']:.2e} "
                  f"unroll_div_frac={r['unroll_div_frac']:.2e} "
                  f"(unroll must be 0 — it is the production workaround)",
                  flush=True)
            assert r["unroll_div_frac"] == 0.0, "unrolled microchunk diverged!"
        except Exception as e:
            print(f"# probe[lax_map] failed: {str(e).splitlines()[0][:120]}",
                  flush=True)

    # flagship last (and mandatory: a failure here fails the bench).
    # This is the PRODUCTION path: configs/neus.yaml ships
    # training.fused_samplers: true AND training.fused_nablas_vjp: true,
    # so the flagship number is measured with the hierarchical-upsampler
    # megakernel and the custom-VJP fused nablas kernel on, exactly as a
    # user training configs/neus.yaml on a TPU would run it.
    rps = bench_neus_flagship()
    results.append((
        "NeuS train throughput (512 rays/step, 64+64 samples, eikonal, "
        "production fused sampler + fused nablas VJP)",
        rps, "rays/sec/chip", rps / BASELINE_RAYS_PER_SEC))

    for metric, value, unit, vs in results:
        _emit(metric, value, unit, vs)


if __name__ == "__main__":
    main()
