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
