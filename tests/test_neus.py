"""NeuS framework tests: unbiasedness oracle, render sanity, end-to-end overfit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.config import ConfigDict
from neurecon_tpu.models.frameworks.neus import (
    NeuS,
    alpha_to_w,
    cdf_Phi_s,
    make_trainer,
    make_volume_render_fn,
    sdf_to_alpha,
    sdf_to_w,
    get_model,
)


def tiny_model(**over):
    cfg = dict(variance_init=0.05, speed_factor=10.0, W_geo_feat=64,
               obj_bounding_radius=1.0,
               surface_cfg=dict(W=64, D=4, skips=[2], embed_multires=4,
                                radius_init=0.5),
               radiance_cfg=dict(W=64, D=2, skips=[], embed_multires=-1,
                                 embed_multires_view=2))
    cfg.update(over)
    return NeuS(**cfg)


class TestSdfToAlpha:
    def test_weights_peak_at_surface(self):
        """NeuS unbiasedness (ref debug_tools/plot_neus_bias.py oracle): for a
        linear 1-D sdf crossing zero, the visibility-weight argmax lies at the
        zero crossing."""
        d = jnp.linspace(0.0, 2.0, 257)[None]  # one ray, fine sampling
        surface_at = 1.3
        sdf = surface_at - d  # sdf > 0 before the surface
        for s in (16.0, 64.0, 256.0):
            cdf, alpha, w = sdf_to_w(sdf, s)
            d_mid = 0.5 * (d[..., 1:] + d[..., :-1])
            peak = float(d_mid[0, int(jnp.argmax(w[0]))])
            assert abs(peak - surface_at) < 0.02, (s, peak)

    def test_alpha_in_01_and_weights_sum_le_1(self):
        key = jax.random.PRNGKey(0)
        sdf = jax.random.normal(key, (8, 65))
        cdf, alpha = sdf_to_alpha(sdf, 64.0)
        w = alpha_to_w(alpha)
        assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0 + 1e-6
        assert float(w.sum(-1).max()) <= 1.0 + 1e-5

    def test_stabilizer_survives_jit(self):
        """XLA reassociates `1 - alpha + 1e-10` into `(1 + 1e-10) - alpha`
        and folds the constant away (1e-10 < ulp(1.0) in f32), silently
        deleting the reference's transmittance stabilizer under jit — see
        docs/probes/xla_stabilizer_fold_probe.py. alpha_to_w must keep
        transmittance strictly positive after a fully-opaque sample."""
        alpha = jnp.asarray([[1.0, 0.5]], jnp.float32)
        w = jax.jit(alpha_to_w)(alpha)
        assert float(w[0, 1]) > 0.0, "stabilizer folded away under jit"
        np.testing.assert_allclose(float(w[0, 1]), 0.5e-10, rtol=1e-3)

    def test_cdf_phi_is_sigmoid(self):
        x = jnp.linspace(-1, 1, 11)
        np.testing.assert_allclose(np.asarray(cdf_Phi_s(x, 10.0)),
                                   1 / (1 + np.exp(-10.0 * np.asarray(x))), rtol=1e-6)


class TestRender:
    @pytest.mark.parametrize("algo", ["official_solution", "direct_use", "direct_more"])
    def test_render_shapes_and_finite(self, algo):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(
            model, N_samples=16, N_importance=16, N_upsample_iters=4,
            N_nograd_samples=64, upsample_algo=algo, perturb=True,
            calc_normal=True, detailed_output=True)
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (12, 3))
        rays_d = jnp.stack(
            [jax.random.normal(jax.random.PRNGKey(1), (12,)) * 0.1,
             jax.random.normal(jax.random.PRNGKey(2), (12,)) * 0.1,
             jnp.ones((12,))], axis=-1)
        rgb, depth, extras = jax.jit(render)(params, rays_o, rays_d,
                                             jax.random.PRNGKey(3))
        assert rgb.shape == (12, 3) and depth.shape == (12,)
        assert extras["normals_volume"].shape == (12, 3)
        for k, v in extras.items():
            if isinstance(v, jnp.ndarray):
                assert np.all(np.isfinite(np.asarray(v))), k
        # fresh geometric init == sphere of radius 0.5 -> depth ≈ 2.5 for
        # the central ray
        assert abs(float(depth[jnp.argmin(jnp.abs(rays_d[:, 0]) + jnp.abs(rays_d[:, 1]))]) - 2.5) < 0.2

    def test_render_with_outside_nerf(self):
        model = tiny_model(use_outside_nerf=True)
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(
            model, N_samples=16, N_importance=16, N_outside=8, perturb=True,
            detailed_output=True)
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (4, 3))
        rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
        rgb, depth, extras = render(params, rays_o, rays_d, jax.random.PRNGKey(1))
        assert extras["sigma_out"] is not None
        assert np.all(np.isfinite(np.asarray(rgb)))


class TestTraining:
    def _args(self, H, W):
        return ConfigDict({
            "data": {"N_rays": 96, "obj_bounding_radius": 1.0, "val_rayschunk": 256},
            "model": {"framework": "NeuS"},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "speed_factor": 10.0,
                         "lr": 5e-4, "num_iters": 400,
                         "scheduler": {"type": "warmupcosine", "warmup_steps": 20}},
        })

    def test_overfit_synthetic_sphere(self):
        """End-to-end: 300 steps on the analytic sphere scene must shrink the
        image loss and produce roughly correct surface depth."""
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.models.base import make_optimizer
        from neurecon_tpu.training import init_train_state, make_train_step

        H, W = 60, 80
        scene = make_synthetic_scene(n_images=8, H=H, W=W, radius=0.5)
        args = self._args(H, W)

        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render_kwargs = {"H": H, "W": W, "N_samples": 24, "N_importance": 16,
                         "N_upsample_iters": 4, "perturb": True,
                         "obj_bounding_radius": 1.0}
        loss_fn = make_trainer(model, args, render_kwargs)
        optimizer = make_optimizer(args, params)
        state = init_train_state(params, optimizer)
        step_fn = make_train_step(loss_fn, optimizer)

        key = jax.random.PRNGKey(42)
        first_losses, last_losses = None, None
        for it in range(300):
            key, sub = jax.random.split(key)
            img = it % scene["c2w"].shape[0]
            batch = {
                "c2w": scene["c2w"][img][None],
                "intrinsics": scene["intrinsics"][img][None],
                "rgb": scene["rgb"][img][None],
                "object_mask": scene["object_mask"][img][None],
            }
            state, metrics = step_fn(state, batch, sub)
            if it == 0:
                first_losses = jax.tree_util.tree_map(float, metrics["losses"])
            last_losses = jax.tree_util.tree_map(float, metrics["losses"])

        assert np.isfinite(last_losses["total"])
        assert last_losses["loss_img"] < 0.6 * first_losses["loss_img"], (
            first_losses, last_losses)
        assert last_losses["loss_mask"] < first_losses["loss_mask"]

        # validate: render center rays of view 0 and compare depth to analytic
        render = make_volume_render_fn(
            model, N_samples=24, N_importance=16, N_upsample_iters=4,
            perturb=False, obj_bounding_radius=1.0, detailed_output=False)
        from neurecon_tpu.ops import get_rays_at
        # center pixel of image 0
        c2w = jnp.asarray(scene["c2w"][0])
        intr = jnp.asarray(scene["intrinsics"][0])
        center = (H // 2) * W + (W // 2)
        inds = jnp.array([center])
        rays_o, rays_d = get_rays_at(inds, c2w, intr, H, W)
        rgb, depth, _ = render(state.params, rays_o, rays_d, jax.random.PRNGKey(0))
        gt_depth = float(scene["depth"][0][center])
        assert abs(float(depth[0]) - gt_depth) < 0.25, (float(depth[0]), gt_depth)

    def test_loss_grads_finite(self):
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        H, W = 40, 40
        scene = make_synthetic_scene(n_images=2, H=H, W=W)
        args = self._args(H, W)
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        loss_fn = make_trainer(model, args, {"H": H, "W": W, "N_samples": 16,
                                             "N_importance": 16, "perturb": True})
        batch = {"c2w": scene["c2w"][:1], "intrinsics": scene["intrinsics"][:1],
                 "rgb": scene["rgb"][:1], "object_mask": scene["object_mask"][:1]}
        (total, (losses, extras)), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, jax.random.PRNGKey(1), 0),
            has_aux=True)(params)
        assert np.isfinite(float(total))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
        # ln_s must receive gradient (learnable variance)
        assert float(jnp.abs(grads["ln_s"]).sum()) > 0


class TestGetModel:
    def test_get_model_from_config(self):
        args = ConfigDict({
            "data": {"N_rays": 64, "val_rayschunk": 128, "obj_bounding_radius": 1.0},
            "model": {"framework": "NeuS", "obj_bounding_radius": 1.0,
                      "surface": {"D": 2, "W": 32, "skips": [], "embed_multires": 2},
                      "radiance": {"D": 1, "W": 32, "skips": []},
                      "W_geometry_feature": 32},
            "training": {"with_mask": True, "w_eikonal": 0.1, "speed_factor": 10.0},
        })
        model, trainer_factory, kw_train, kw_test, render_factory = get_model(args)
        params = model.init(jax.random.PRNGKey(0))
        assert "ln_s" in params
        assert kw_test["perturb"] is False and kw_train["perturb"] is True
        render = render_factory(N_samples=8, N_importance=8, perturb=False,
                                detailed_output=False)
        rays_o = jnp.zeros((4, 3)) + jnp.array([0, 0, -2.0])
        rays_d = jnp.broadcast_to(jnp.array([0, 0, 1.0]), (4, 3))
        rgb, depth, extras = render(params, rays_o, rays_d, jax.random.PRNGKey(0))
        assert rgb.shape == (4, 3)


class TestNerfPPOriginRay:
    def test_grad_finite_for_ray_through_exact_origin(self):
        """Regression: a ray through the EXACT scene origin (synthetic
        cameras' principal rays) can put an inside sample at r == 0; the
        inverted-sphere input 0/0 NaN was masked out of the forward by the
        where-merge but poisoned every nerf_outside parameter gradient via
        0-cotangent x NaN-activation. One such batch NaN'd the background
        net in training (found at it=1059 of synthetic_quality_nomask)."""
        model = tiny_model(use_outside_nerf=True)
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(
            model, N_samples=16, N_importance=16, N_outside=8, perturb=False,
            detailed_output=False)
        # principal ray: origin at exactly radius 3, aimed exactly at 0 —
        # with near=2/far=4 the sample grid brackets depth 3.0 symmetrically,
        # so a midpoint lands at the origin exactly
        rays_o = jnp.array([[0.0, 0.0, -3.0], [0.1, 0.0, -3.0]])
        rays_d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        tgt = jnp.zeros((2, 3))

        def loss(p):
            rgb, depth, _ = render(p, rays_o, rays_d, jax.random.PRNGKey(1))
            return jnp.mean(jnp.abs(rgb - tgt))

        val, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
