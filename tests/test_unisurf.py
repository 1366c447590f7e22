"""UNISURF framework tests."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.config import ConfigDict
from neurecon_tpu.models.frameworks.unisurf import (
    UNISURF,
    make_trainer,
    make_volume_render_fn,
)


def tiny_model():
    return UNISURF(
        W_geo_feat=64,
        surface_cfg=dict(W=64, D=4, skips=[2], embed_multires=4, radius_init=0.5),
        radiance_cfg=dict(W=64, D=2, skips=[], embed_multires=-1,
                          embed_multires_view=2))


class TestOpacity:
    def test_opacity_surface_roundtrip(self):
        op = np.array([0.1, 0.5, 0.9])
        logits = UNISURF.get_surface_from_opacity(op)
        back = np.asarray(UNISURF.get_opacity_from_surface(jnp.asarray(logits)))
        np.testing.assert_allclose(back, op, rtol=1e-5)
        # tau=0.5 -> logit_tau=0 (the SDF zero crossing)
        assert abs(UNISURF.get_surface_from_opacity(0.5)) < 1e-6
        # (+) logits = outside = low opacity
        assert float(UNISURF.get_opacity_from_surface(jnp.asarray(5.0))) < 0.01


class TestRender:
    def test_shapes_and_finiteness(self):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(
            model, default_interval=0.3, radius_of_interest=4.0, perturb=True,
            N_query=16, N_freespace=8, N_steps=64, calc_normal=True,
            detailed_output=True)
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (6, 3))
        rays_d = jnp.stack([jax.random.normal(jax.random.PRNGKey(1), (6,)) * 0.1,
                            jax.random.normal(jax.random.PRNGKey(2), (6,)) * 0.1,
                            jnp.ones((6,))], -1)
        rgb, depth, extras = jax.jit(render)(params, rays_o, rays_d,
                                             jax.random.PRNGKey(3))
        assert rgb.shape == (6, 3) and depth.shape == (6,)
        assert extras["surface_points"].shape == (6, 3)
        for k, v in extras.items():
            if isinstance(v, jnp.ndarray) and v.dtype != bool:
                assert np.all(np.isfinite(np.asarray(v))), k
        # interval + freespace = N_pts samples
        assert extras["alpha"].shape == (6, 24)

    def test_interval_is_traceable(self):
        """The shrinking Δ schedule must work as a traced scalar under jit."""
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(model, radius_of_interest=4.0,
                                       N_query=8, N_freespace=4, N_steps=32,
                                       detailed_output=False)
        jitted = jax.jit(lambda p, o, d, k, iv: render(p, o, d, k, interval=iv))
        rays_o = jnp.zeros((2, 3)).at[:, 2].set(-3.0)
        rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
        for iv in (1.0, 0.5, 0.05):
            rgb, *_ = jitted(params, rays_o, rays_d, jax.random.PRNGKey(0),
                             jnp.asarray(iv))
            assert np.all(np.isfinite(np.asarray(rgb)))


class TestTraining:
    def test_overfit_synthetic(self):
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.base import make_optimizer
        from neurecon_tpu.training import init_train_state, make_train_step

        H, W = 40, 50
        scene = make_synthetic_scene(n_images=6, H=H, W=W, radius=0.8,
                                     cam_radius=2.8)
        args = ConfigDict({
            "data": {"N_rays": 64, "val_rayschunk": 128},
            "model": {"framework": "UNISURF", "obj_bounding_radius": 4.0,
                      "tau": 0.5},
            "training": {"lr": 1e-4, "num_iters": 300, "w_reg": 0.01,
                         "perturb_surface_pts": 0.01,
                         "delta_max": 1.0, "delta_min": 0.05, "delta_beta": 1.5e-5,
                         "scheduler": {"type": "multistep",
                                       "milestones": [200], "gamma": 0.5}},
        })
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        loss_fn = make_trainer(model, args,
                               {"H": H, "W": W, "perturb": True,
                                "radius_of_interest": 4.0, "logit_tau": 0.0,
                                "N_query": 16, "N_freespace": 8, "N_steps": 64})
        optimizer = make_optimizer(args, params)
        state = init_train_state(params, optimizer)
        step_fn = make_train_step(loss_fn, optimizer)

        key = jax.random.PRNGKey(5)
        first, last = None, None
        for it in range(150):
            key, sub = jax.random.split(key)
            img = it % 6
            batch = {"c2w": scene["c2w"][img][None],
                     "intrinsics": scene["intrinsics"][img][None],
                     "rgb": scene["rgb"][img][None]}
            state, metrics = step_fn(state, batch, sub)
            if it == 0:
                first = jax.tree_util.tree_map(float, metrics["losses"])
            last = jax.tree_util.tree_map(float, metrics["losses"])
        assert np.isfinite(last["total"])
        assert last["loss_img"] < 0.8 * first["loss_img"], (first, last)
        # interval decays (logged as scalar)
        assert float(metrics["scalars"]["interval"]) <= 1.0

    def test_get_model_dispatch(self):
        args = ConfigDict({
            "data": {"N_rays": 32, "val_rayschunk": 64, "downscale": 1},
            "model": {"framework": "UNISURF", "obj_bounding_radius": 4.0,
                      "tau": 0.5, "W_geometry_feature": 32,
                      "surface": {"D": 2, "W": 32, "skips": [], "embed_multires": 2},
                      "radiance": {"D": 1, "W": 32, "skips": []}},
            "training": {"w_reg": 0.01, "delta_max": 1.0, "delta_min": 0.05,
                         "delta_beta": 1.5e-5},
        })
        from neurecon_tpu.models.frameworks import get_model as dispatch
        model, trainer_factory, kw_train, kw_test, render_factory = dispatch(args)
        assert kw_train["logit_tau"] == 0.0  # tau=0.5 -> 0
        params = model.init(jax.random.PRNGKey(0))
        assert "implicit_surface" in params


class TestCheckpointRenderInterval:
    """Evaluation/val renders of a UNISURF checkpoint must use the interval
    Δ the model was TRAINED with at that step, not the iteration-0 default —
    rendering a late checkpoint (Δ=delta_min) at Δ=delta_max queries the
    radiance far outside its supervised band (measured −9.9 dB full /
    −43.9 dB interior on the 450k reference-length run; docs/quality.md
    round 5)."""

    def _cfg(self, tmp=None):
        return ConfigDict({
            "expname": "itest", "device_ids": -1,
            "data": {"type": "synthetic", "batch_size": 1, "data_dir": None,
                     "downscale": 1, "n_images": 2, "H": 20, "W": 24,
                     "N_rays": 16, "val_rayschunk": 480, "val_downscale": 1},
            "model": {"framework": "UNISURF", "obj_bounding_radius": 4.0,
                      "tau": 0.5, "W_geometry_feature": 16,
                      "N_query": 4, "N_freespace": 2, "N_steps": 16,
                      "surface": {"D": 1, "W": 16, "skips": [],
                                  "radius_init": 0.5, "embed_multires": 2},
                      "radiance": {"D": 1, "W": 16, "skips": [],
                                   "embed_multires": -1,
                                   "embed_multires_view": -1}},
            "training": {"w_reg": 0.01, "delta_max": 1.0, "delta_min": 0.05,
                         "delta_beta": 1.5e-5, "num_iters": 450000,
                         "log_root_dir": str(tmp) if tmp else "/tmp"},
        })

    def test_interval_at_matches_traced_schedule(self):
        from neurecon_tpu.models.frameworks.unisurf import interval_at
        args = self._cfg()
        for it in (0, 1, 50_000, 199_000, 200_000, 450_000):
            traced = float(jnp.maximum(
                1.0 * jnp.exp(-jnp.asarray(it, jnp.float32) * 1.5e-5), 0.05))
            assert abs(interval_at(args, it) - traced) < 1e-6, it
        assert interval_at(args, 450_000) == 0.05
        assert interval_at(args, 0) == 1.0

    def test_checkpoint_render_kwargs_dispatch(self):
        from neurecon_tpu.models.frameworks import checkpoint_render_kwargs
        args = self._cfg()
        assert checkpoint_render_kwargs(args, 0) == {"interval": 1.0}
        assert checkpoint_render_kwargs(args, 450_000) == {"interval": 0.05}
        # missing global_step (None / -1) falls back to end-of-training
        assert checkpoint_render_kwargs(args, None) == {"interval": 0.05}
        assert checkpoint_render_kwargs(args, -1) == {"interval": 0.05}
        args.model["framework"] = "NeuS"
        assert checkpoint_render_kwargs(args, 0) == {}

    def test_eval_staged_forwards_trained_interval(self, tmp_path):
        """eval_staged must thread Δ(step) of EACH checkpoint into the
        render — spy on render_full_image and check the forwarded kwarg."""
        import pickle

        import neurecon_tpu.training as training
        from neurecon_tpu.models.frameworks import get_model as dispatch
        from neurecon_tpu.tools.eval_staged import evaluate_ckpts

        args = self._cfg(tmp_path)
        model, *_ = dispatch(args)
        params = jax.tree_util.tree_map(np.asarray,
                                        model.init(jax.random.PRNGKey(0)))
        ckpts = []
        for step in (0, 450_000):
            p = tmp_path / f"{step:08d}.pt"
            with open(p, "wb") as f:
                pickle.dump({"model": params, "global_step": step}, f)
            ckpts.append(str(p))

        captured = []
        real = training.render_full_image

        def spy(render_fn, prm, rays_o, rays_d, key, **kw):
            captured.append(kw.get("interval"))
            n = rays_o.reshape(-1, 3).shape[0]
            return {"rgb": np.zeros((n, 3), np.float32),
                    "depth_volume": np.zeros((n,), np.float32),
                    "mask_volume": np.zeros((n,), np.float32)}

        training.render_full_image = spy
        try:
            rows = evaluate_ckpts(args, ckpts, gt_mesh=None, n_eval=1)
        finally:
            training.render_full_image = real
        assert captured == [1.0, 0.05], captured
        assert [r["step"] for r in rows] == [0, 450_000]
