"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.config import ConfigDict
from neurecon_tpu.models.base import make_optimizer
from neurecon_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_rays,
)
from neurecon_tpu.training import init_train_state, make_train_step, sample_ray_batch


def _setup(N_rays=64):
    from neurecon_tpu.dataio.synthetic import make_synthetic_scene
    from neurecon_tpu.models.frameworks.neus import make_ray_loss_fn, make_trainer
    from tests.test_neus import tiny_model

    H, W = 40, 48
    scene = make_synthetic_scene(n_images=2, H=H, W=W)
    args = ConfigDict({
        "data": {"N_rays": N_rays},
        "model": {"framework": "NeuS"},
        "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                     "lr": 5e-4, "num_iters": 100, "speed_factor": 10.0,
                     "scheduler": {"type": "warmupcosine", "warmup_steps": 10}},
    })
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    rk = {"H": H, "W": W, "N_samples": 16, "N_importance": 16, "perturb": True}
    ray_loss = make_ray_loss_fn(model, args, rk)
    optimizer = make_optimizer(args, params)
    batch = {"c2w": scene["c2w"][:1], "intrinsics": scene["intrinsics"][:1],
             "rgb": scene["rgb"][:1], "object_mask": scene["object_mask"][:1]}
    rb = sample_ray_batch(jax.random.PRNGKey(1), batch, H, W, N_rays)
    return model, params, ray_loss, optimizer, rb


class TestShardedStep:
    def test_eight_device_step_runs_and_matches_single(self):
        assert jax.device_count() >= 8
        model, params, ray_loss, optimizer, rb = _setup(N_rays=64)
        mesh = make_mesh(8)

        # sharded step (copy params: the step donates its input state)
        params_copy = jax.tree_util.tree_map(jnp.copy, params)
        state_s = init_train_state(params_copy, optimizer)
        step_s = make_sharded_train_step(ray_loss, optimizer, mesh)
        rb_sharded = shard_rays(mesh, rb)
        # the ray axis really is split over 8 devices
        assert len(rb_sharded["rays_o"].sharding.device_set) == 8
        new_s, metrics_s = step_s(state_s, rb_sharded, jax.random.PRNGKey(2))

        # unsharded reference step
        def loss_fn(params, batch, key, it):
            return ray_loss(params, batch, key, it)
        state_u = init_train_state(params, optimizer)
        step_u = make_train_step(loss_fn, optimizer)
        new_u, metrics_u = step_u(state_u, rb, jax.random.PRNGKey(2))

        for k in metrics_u["losses"]:
            a, b = float(metrics_s["losses"][k]), float(metrics_u["losses"][k])
            assert np.isfinite(a)
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5), k

        # params updated and replicated-consistent
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), new_s.params, new_u.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-4

    def test_multi_step_training_progresses(self):
        model, params, ray_loss, optimizer, rb = _setup(N_rays=64)
        mesh = make_mesh(8)
        state = init_train_state(params, optimizer)
        step = make_sharded_train_step(ray_loss, optimizer, mesh)
        key = jax.random.PRNGKey(3)
        losses = []
        for _ in range(20):
            key, sub = jax.random.split(key)
            state, metrics = step(state, shard_rays(mesh, rb), sub)
            losses.append(float(metrics["losses"]["total"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestShardedTrainBlock:
    def test_block_matches_sequential_sharded_steps(self):
        """K sharded steps in ONE dispatch (sampling + sharding constraint +
        grad psum inside a compiled scan) must equal K sequential sharded
        steps with the same key schedule — and both must train."""
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.neus import make_ray_loss_fn
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        from tests.test_neus import tiny_model

        H, W, N_rays, K = 40, 48, 64, 3
        scene = make_synthetic_scene(n_images=4, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "NeuS"},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "lr": 5e-4, "num_iters": 100, "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        rk = {"H": H, "W": W, "N_samples": 16, "N_importance": 16,
              "perturb": True}
        ray_loss = make_ray_loss_fn(model, args, rk)
        optimizer = make_optimizer(args, params)
        data = {k: jnp.asarray(scene[k])
                for k in ("c2w", "intrinsics", "rgb", "object_mask")}

        def slice_image(data, idx):
            return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                    for k, v in data.items()}

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, slice_image(data, idx), H, W, N_rays)

        mesh = make_mesh(8)
        idxs = jnp.asarray([0, 2, 1])
        key = jax.random.PRNGKey(7)

        # one-dispatch block
        params_b = jax.tree_util.tree_map(jnp.copy, params)
        block = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        state_b, metrics_b = block(init_train_state(params_b, optimizer),
                                   data, idxs, key)

        # sequential reference: same key schedule, per-step sharded steps
        state_s = init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                                   optimizer)
        step_s = make_sharded_train_step(ray_loss, optimizer, mesh)
        keys = jax.random.split(key, K)
        for i in range(K):
            k_sample, k_render = jax.random.split(keys[i])
            rb = shard_rays(mesh, jax.jit(sample_fn)(data, idxs[i], k_sample))
            state_s, metrics_s = step_s(state_s, rb, k_render)

        assert int(state_b.step) == K
        for k in metrics_s["losses"]:
            np.testing.assert_allclose(float(metrics_b["losses"][k]),
                                       float(metrics_s["losses"][k]),
                                       rtol=2e-3, atol=1e-5)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state_b.params, state_s.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-4

    def test_block_k1_matches_unsharded_step(self):
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.neus import make_ray_loss_fn
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        from tests.test_neus import tiny_model

        H, W, N_rays = 40, 48, 64
        scene = make_synthetic_scene(n_images=2, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "NeuS"},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "lr": 5e-4, "num_iters": 100, "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        rk = {"H": H, "W": W, "N_samples": 16, "N_importance": 16,
              "perturb": True}
        ray_loss = make_ray_loss_fn(model, args, rk)
        optimizer = make_optimizer(args, params)
        data = {k: jnp.asarray(scene[k])
                for k in ("c2w", "intrinsics", "rgb", "object_mask")}

        def slice_image(data, idx):
            return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                    for k, v in data.items()}

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, slice_image(data, idx), H, W, N_rays)

        mesh = make_mesh(8)
        key = jax.random.PRNGKey(9)

        block = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        state_b, metrics_b = block(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, jnp.asarray([1]), key)

        # unsharded reference with the same key schedule
        (k,) = jax.random.split(key, 1)
        k_sample, k_render = jax.random.split(k)
        rb = jax.jit(sample_fn)(data, jnp.asarray(1), k_sample)

        def loss_fn(params, rb_, key_, it_):
            return ray_loss(params, rb_, key_, it_)

        step_u = make_train_step(loss_fn, optimizer)
        state_u, metrics_u = step_u(init_train_state(params, optimizer),
                                    rb, k_render)

        for k2 in metrics_u["losses"]:
            np.testing.assert_allclose(float(metrics_b["losses"][k2]),
                                       float(metrics_u["losses"][k2]),
                                       rtol=2e-3, atol=1e-5)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state_b.params, state_u.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-4


class TestPipelinedBlock:
    """Software-pipelined train block (training.overlap_sampler): the depth
    sampler for step i+1 runs in body i against pre-update params."""

    def _common(self, n_images=4):
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.neus import (
            make_pipeline_fns, make_ray_loss_fn)
        from tests.test_neus import tiny_model

        H, W, N_rays = 40, 48, 64
        scene = make_synthetic_scene(n_images=n_images, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "NeuS"},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "lr": 5e-4, "num_iters": 100, "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        rk = {"H": H, "W": W, "N_samples": 16, "N_importance": 16,
              "perturb": True}
        ray_loss = make_ray_loss_fn(model, args, rk)
        pipe = make_pipeline_fns(model, args, rk)
        data = {k: jnp.asarray(scene[k])
                for k in ("c2w", "intrinsics", "rgb", "object_mask")}

        def slice_image(data, idx):
            return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                    for k, v in data.items()}

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, slice_image(data, idx), H, W, N_rays)

        return model, params, args, ray_loss, pipe, data, sample_fn

    def test_depth_sample_plus_loss_equals_ray_loss(self):
        """Same params + same key: the split (sample, then loss-with-samples)
        reproduces the fused ray loss exactly (shared key split)."""
        model, params, args, ray_loss, pipe, data, sample_fn = self._common()
        key = jax.random.PRNGKey(3)
        rb = jax.jit(sample_fn)(data, jnp.asarray(0), key)
        k_render = jax.random.PRNGKey(4)

        total_f, (losses_f, _) = jax.jit(ray_loss)(params, rb, k_render, 0)
        d = jax.jit(pipe["depth_sample"])(params, rb, k_render)
        assert d.shape[:2] == rb["rays_o"].shape[:2]
        total_s, (losses_s, _) = jax.jit(pipe["loss_with_samples"])(
            params, rb, d, k_render, 0)

        np.testing.assert_allclose(float(total_f), float(total_s),
                                   rtol=1e-6, atol=1e-7)
        for k in losses_f:
            np.testing.assert_allclose(float(losses_f[k]), float(losses_s[k]),
                                       rtol=1e-6, atol=1e-7)

    def test_pipelined_block_matches_fused_when_params_frozen(self):
        """With a zero-lr optimizer the staleness vanishes — the pipelined
        block must reproduce the fused block's last-step losses exactly."""
        import optax

        from neurecon_tpu.parallel.sharding import make_sharded_train_block

        model, params, args, ray_loss, pipe, data, sample_fn = self._common()
        optimizer = optax.sgd(0.0)
        mesh = make_mesh(8)
        idxs = jnp.asarray([0, 2, 1, 3])
        key = jax.random.PRNGKey(11)

        block_f = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        state_f, metrics_f = block_f(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, key)

        block_p = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                           pipeline_fns=pipe)
        state_p, metrics_p = block_p(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, key)

        assert int(state_p.step) == len(idxs)
        for k in metrics_f["losses"]:
            np.testing.assert_allclose(float(metrics_p["losses"][k]),
                                       float(metrics_f["losses"][k]),
                                       rtol=1e-5, atol=1e-6)

    def test_pipelined_block_trains_close_to_fused(self):
        """With a real optimizer the sample placement is one step stale —
        training must still progress and track the fused block closely."""
        from neurecon_tpu.parallel.sharding import make_sharded_train_block

        model, params, args, ray_loss, pipe, data, sample_fn = self._common()
        optimizer = make_optimizer(args, params)
        mesh = make_mesh(8)
        key = jax.random.PRNGKey(13)
        idxs = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3])

        block_f = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        state_f, metrics_f = block_f(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, key)

        block_p = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                           pipeline_fns=pipe)
        state_p, metrics_p = block_p(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, key)

        lf = float(metrics_f["losses"]["total"])
        lp = float(metrics_p["losses"]["total"])
        assert np.isfinite(lp)
        # same data, same keys, only quadrature placement is stale: the two
        # last-step losses should be near-identical this early in training
        np.testing.assert_allclose(lp, lf, rtol=0.05, atol=5e-3)
        # params stay close too
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state_p.params, state_f.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 5e-3

    def test_volsdf_split_and_pipelined_block(self):
        """VolSDF variant: split == fused exactly; frozen-params pipelined
        block == fused block."""
        import optax

        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.volsdf import (
            make_pipeline_fns as volsdf_pipe, make_ray_loss_fn as volsdf_loss)
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        from tests.test_volsdf import tiny_model as volsdf_tiny

        H, W, N_rays = 40, 48, 64
        scene = make_synthetic_scene(n_images=2, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "VolSDF", "obj_bounding_radius": 3.0},
            "training": {"w_eikonal": 0.1, "lr": 5e-4, "num_iters": 100,
                         "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        model = volsdf_tiny()
        params = model.init(jax.random.PRNGKey(0))
        rk = {"H": H, "W": W, "near": 0.0, "far": 6.0, "N_samples": 24,
              "N_importance": 16, "max_upsample_steps": 2,
              "fine_sample_mul": 1, "obj_bounding_radius": 3.0,
              "perturb": True}
        ray_loss = volsdf_loss(model, args, rk)
        pipe = volsdf_pipe(model, args, rk)
        data = {k: jnp.asarray(scene[k]) for k in ("c2w", "intrinsics", "rgb")}

        def slice_image(data, idx):
            return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                    for k, v in data.items()}

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, slice_image(data, idx), H, W, N_rays)

        # split == fused under the same key
        key = jax.random.PRNGKey(3)
        rb = jax.jit(sample_fn)(data, jnp.asarray(0), key)
        k_render = jax.random.PRNGKey(4)
        total_f, (losses_f, _) = jax.jit(ray_loss)(params, rb, k_render, 0)
        fine = jax.jit(pipe["depth_sample"])(params, rb, k_render)
        assert fine[0].shape[:2] == rb["rays_o"].shape[:2]
        total_s, _ = jax.jit(pipe["loss_with_samples"])(
            params, rb, fine, k_render, 0)
        np.testing.assert_allclose(float(total_f), float(total_s),
                                   rtol=1e-6, atol=1e-7)

        # frozen-params pipelined block == fused block
        optimizer = optax.sgd(0.0)
        mesh = make_mesh(8)
        idxs = jnp.asarray([0, 1, 0])
        bkey = jax.random.PRNGKey(11)
        block_f = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        _, metrics_f = block_f(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, bkey)
        block_p = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                           pipeline_fns=pipe)
        _, metrics_p = block_p(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, bkey)
        for k in metrics_f["losses"]:
            np.testing.assert_allclose(float(metrics_p["losses"][k]),
                                       float(metrics_f["losses"][k]),
                                       rtol=1e-5, atol=1e-6)

    def test_unisurf_split_and_pipelined_block(self):
        """UNISURF variant: deterministic root-find -> split == fused exactly;
        frozen-params pipelined block == fused block."""
        import optax

        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.unisurf import (
            make_pipeline_fns as uni_pipe, make_ray_loss_fn as uni_loss)
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        from tests.test_unisurf import tiny_model as uni_tiny

        H, W, N_rays = 40, 48, 64
        scene = make_synthetic_scene(n_images=2, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "UNISURF"},
            "training": {"lr": 1e-4, "num_iters": 100, "w_reg": 0.01,
                         "delta_max": 1.0, "delta_min": 0.05,
                         "delta_beta": 1.5e-5, "speed_factor": 1.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        model = uni_tiny()
        params = model.init(jax.random.PRNGKey(0))
        rk = {"H": H, "W": W, "N_query": 16, "N_freespace": 8, "N_steps": 32,
              "radius_of_interest": 1.0, "perturb": True}
        ray_loss = uni_loss(model, args, rk)
        pipe = uni_pipe(model, args, rk)
        data = {k: jnp.asarray(scene[k]) for k in ("c2w", "intrinsics", "rgb")}

        def slice_image(data, idx):
            return {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                    for k, v in data.items()}

        def sample_fn(data, idx, key):
            return sample_ray_batch(key, slice_image(data, idx), H, W, N_rays)

        key = jax.random.PRNGKey(3)
        rb = jax.jit(sample_fn)(data, jnp.asarray(0), key)
        k_render = jax.random.PRNGKey(4)
        total_f, (losses_f, _) = jax.jit(ray_loss)(params, rb, k_render, 0)
        surf = jax.jit(pipe["depth_sample"])(params, rb, k_render)
        assert surf[1].shape[:2] == rb["rays_o"].shape[:2]
        total_s, _ = jax.jit(pipe["loss_with_samples"])(
            params, rb, surf, k_render, 0)
        np.testing.assert_allclose(float(total_f), float(total_s),
                                   rtol=1e-6, atol=1e-7)

        optimizer = optax.sgd(0.0)
        mesh = make_mesh(8)
        idxs = jnp.asarray([0, 1, 0])
        bkey = jax.random.PRNGKey(11)
        block_f = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn)
        _, metrics_f = block_f(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, bkey)
        block_p = make_sharded_train_block(ray_loss, optimizer, mesh, sample_fn,
                                           pipeline_fns=pipe)
        _, metrics_p = block_p(
            init_train_state(jax.tree_util.tree_map(jnp.copy, params),
                             optimizer), data, idxs, bkey)
        for k in metrics_f["losses"]:
            np.testing.assert_allclose(float(metrics_p["losses"][k]),
                                       float(metrics_f["losses"][k]),
                                       rtol=1e-5, atol=1e-6)


class TestShardedWithMegakernels:
    def test_sharded_step_with_fused_upsampler(self, monkeypatch):
        """The Pallas upsampler (interpret) must compose with the GSPMD
        sharded step: same losses as the sharded XLA path (same key =>
        same sample sets)."""
        assert jax.device_count() >= 8
        mesh = make_mesh(8)

        def losses_with(gate):
            monkeypatch.setenv("NEURECON_FUSED_UPSAMPLE", gate)
            model, params, ray_loss, optimizer, rb = _setup(N_rays=64)
            state = init_train_state(params, optimizer)
            step = make_sharded_train_step(ray_loss, optimizer, mesh)
            rbs = shard_rays(mesh, rb)
            _, metrics = step(state, rbs, jax.random.PRNGKey(5))
            return {k: float(v) for k, v in metrics["losses"].items()}

        ref = losses_with("0")
        got = losses_with("interpret")
        for k in ref:
            assert np.isfinite(got[k]), k
            np.testing.assert_allclose(got[k], ref[k], rtol=5e-3,
                                       atol=1e-4, err_msg=k)

    def test_pipelined_block_with_fused_upsampler(self, monkeypatch):
        """The two production fast paths together (training.fused_samplers +
        training.overlap_sampler): the fused upsampler inside the software-
        pipelined sharded block. Frozen params make the pipelined block
        deterministic, so fused(interpret) must match the XLA pipelined
        block's losses."""
        import optax

        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.frameworks.neus import (make_pipeline_fns,
                                                         make_ray_loss_fn)
        from neurecon_tpu.parallel.sharding import make_sharded_train_block
        from tests.test_neus import tiny_model

        assert jax.device_count() >= 8
        mesh = make_mesh(8)
        H, W, N_rays = 40, 48, 64
        scene = make_synthetic_scene(n_images=2, H=H, W=W)
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "NeuS"},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "lr": 5e-4, "num_iters": 100, "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        rk = {"H": H, "W": W, "N_samples": 16, "N_importance": 16,
              "perturb": True}
        data = {k: jnp.asarray(scene[k])
                for k in ("c2w", "intrinsics", "rgb", "object_mask")}

        def sample_fn(d, idx, key):
            sliced = {k: jax.lax.dynamic_slice_in_dim(v, idx, 1, axis=0)
                      for k, v in d.items()}
            return sample_ray_batch(key, sliced, H, W, N_rays)

        idxs = jnp.asarray([0, 1, 0])

        def losses_with(gate):
            monkeypatch.setenv("NEURECON_FUSED_UPSAMPLE", gate)
            model = tiny_model()
            params = model.init(jax.random.PRNGKey(0))
            ray_loss = make_ray_loss_fn(model, args, rk)
            pipe = make_pipeline_fns(model, args, rk)
            optimizer = optax.sgd(0.0)
            block = make_sharded_train_block(ray_loss, optimizer, mesh,
                                             sample_fn, pipeline_fns=pipe)
            _, metrics = block(init_train_state(params, optimizer), data,
                               idxs, jax.random.PRNGKey(11))
            return {k: float(v) for k, v in metrics["losses"].items()}

        ref = losses_with("0")
        got = losses_with("interpret")
        for k in ref:
            assert np.isfinite(got[k]), k
            np.testing.assert_allclose(got[k], ref[k], rtol=5e-3,
                                       atol=1e-4, err_msg=k)

    def test_sharded_step_with_fused_fine_sample(self, monkeypatch):
        """The VolSDF fused fine-sample kernel family (interpret) must
        compose with the GSPMD sharded step: same losses as the sharded
        XLA path (elementwise-equal sampler => equal sample sets)."""
        from neurecon_tpu.models.frameworks.volsdf import (
            make_ray_loss_fn as volsdf_loss)
        from tests.test_volsdf import tiny_model as volsdf_tiny

        assert jax.device_count() >= 8
        mesh = make_mesh(8)
        H, W, N_rays = 40, 48, 64
        args = ConfigDict({
            "data": {"N_rays": N_rays},
            "model": {"framework": "VolSDF", "obj_bounding_radius": 3.0},
            "training": {"w_eikonal": 0.1, "lr": 5e-4, "num_iters": 100,
                         "speed_factor": 10.0,
                         "scheduler": {"type": "warmupcosine",
                                       "warmup_steps": 10}},
        })
        rk = {"H": H, "W": W, "near": 0.0, "far": 6.0, "N_samples": 24,
              "N_importance": 16, "max_upsample_steps": 2,
              "fine_sample_mul": 1, "obj_bounding_radius": 3.0,
              "perturb": True}

        def losses_with(gate):
            monkeypatch.setenv("NEURECON_FUSED_FINESAMPLE", gate)
            model = volsdf_tiny()
            params = model.init(jax.random.PRNGKey(0))
            ray_loss = volsdf_loss(model, args, rk)
            optimizer = make_optimizer(args, params)
            rays_o = jnp.zeros((N_rays, 3)).at[:, 2].set(-3.0)
            rays_d = jnp.concatenate(
                [jax.random.normal(jax.random.PRNGKey(1), (N_rays, 2)) * 0.1,
                 jnp.ones((N_rays, 1))], -1)
            rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            rb = {"rays_o": rays_o[None], "rays_d": rays_d[None],
                  "target_rgb": jnp.ones((1, N_rays, 3)) * 0.5}
            state = init_train_state(params, optimizer)
            step = make_sharded_train_step(ray_loss, optimizer, mesh)
            rbs = shard_rays(mesh, rb)
            _, metrics = step(state, rbs, jax.random.PRNGKey(5))
            return {k: float(v) for k, v in metrics["losses"].items()}

        ref = losses_with("0")
        got = losses_with("interpret")
        for k in ref:
            assert np.isfinite(got[k]), k
            np.testing.assert_allclose(got[k], ref[k], rtol=5e-3,
                                       atol=1e-4, err_msg=k)
