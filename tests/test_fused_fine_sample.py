"""Fused VolSDF fine-sample megakernel vs the production XLA loop.

Interpret mode on CPU. Unlike the NeuS upsampler comparison, this one is
ELEMENTWISE: fine_sample's interior upsample is deterministic and the
per-checkpoint inverse-CDF uniforms are passed in with the reference key
sequence unsorted, so the fused path reproduces final_fine_dvals, the
beta heat-map, and iter_usage directly (up to fp reassociation flips at
searchsorted boundaries).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.frameworks.volsdf import (VolSDF, fine_sample,
                                                   _fine_sample_dispatch)
from neurecon_tpu.ops.fused_fine_sample import fused_fine_sample


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    th = rng.uniform(-0.35, 0.35, (n, 2)).astype(np.float32)
    d = np.stack([np.sin(th[:, 0]),
                  np.sin(th[:, 1]) * np.cos(th[:, 0]),
                  np.cos(th[:, 1]) * np.cos(th[:, 0])], -1)
    o = np.broadcast_to(np.array([0.0, 0.0, -3.0], np.float32), d.shape)
    return jnp.asarray(o), jnp.asarray(d)


def _setup(n_rays=16, n0=32, use_siren=False):
    cfg = dict(W=64, D=4, skips=[2], embed_multires=4)
    if use_siren:
        cfg = dict(W=64, D=4, skips=[], embed_multires=-1, use_siren=True)
    model = VolSDF(beta_init=0.1, speed_factor=10.0, W_geo_feat=64,
                   obj_bounding_radius=3.0, surface_cfg=cfg,
                   radiance_cfg=dict(W=32, D=1, skips=[], embed_multires=-1,
                                     embed_multires_view=-1))
    params = model.init(jax.random.PRNGKey(0))
    rays_o, rays_d = _rays(n_rays)
    far = jnp.full((n_rays, 1), 6.0)
    t = jnp.linspace(0.0, 1.0, n0)
    d_init = 0.0 * (1 - t) + far * t
    return model, params, rays_o, rays_d, d_init, far


def _both(model, params, rays_o, rays_d, d_init, far, *, perturb,
          max_iter=3, n_up=32, n_final=16, eps=0.1, max_bisection=6):
    sgp = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    alpha, beta = model.forward_ab(params)
    key = jax.random.PRNGKey(9)
    ref = fine_sample(
        lambda x: model.forward_surface(sgp, x), d_init, rays_o, rays_d,
        alpha_net=alpha, beta_net=beta, far=far, key=key, eps=eps,
        max_iter=max_iter, max_bisection=max_bisection,
        final_N_importance=n_final, N_up=n_up, perturb=perturb)
    keys = jax.random.split(key, max_iter + 2)
    us = []
    for i in range(max_iter + 2):
        if perturb:
            us.append(jax.random.uniform(keys[i],
                                         d_init.shape[:-1] + (n_final,)))
        else:
            us.append(jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_final),
                                       d_init.shape[:-1] + (n_final,)))
    got = fused_fine_sample(
        model.implicit_surface, sgp["implicit_surface"], rays_o, rays_d,
        d_init, far, alpha, beta, jnp.concatenate(us, -1), eps=eps,
        max_iter=max_iter, max_bisection=max_bisection, n_final=n_final,
        n_up=n_up, tile=8, interpret=True,
        sphere_bg_r=(model.obj_bounding_radius
                     if model.use_sphere_bg else None))
    return ref, got


class TestFusedFineSample:
    @pytest.mark.parametrize("perturb", [False, True])
    def test_matches_production(self, perturb):
        model, params, rays_o, rays_d, d_init, far = _setup()
        (rd, rb, ri), (gd, gb, gi) = _both(model, params, rays_o, rays_d,
                                           d_init, far, perturb=perturb)
        assert gd.shape == rd.shape
        assert np.isfinite(np.asarray(gd)).all()
        span = float(d_init.max())
        dd = np.abs(np.asarray(gd) - np.asarray(rd))
        frac_off = (dd > 1e-4 * span).mean()
        assert frac_off < 0.02, (
            f"{frac_off:.3%} of fine samples off (max {dd.max():.3e})")
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   rtol=1e-3, atol=1e-5)
        # iter_usage may flip on rays whose bound sits at eps; most agree
        agree = (np.asarray(gi) == np.asarray(ri)).mean()
        assert agree > 0.9, (np.asarray(gi), np.asarray(ri))

    def test_siren_surface(self):
        model, params, rays_o, rays_d, d_init, far = _setup(use_siren=True)
        (rd, _, _), (gd, _, _) = _both(model, params, rays_o, rays_d,
                                       d_init, far, perturb=False)
        dd = np.abs(np.asarray(gd) - np.asarray(rd))
        assert np.isfinite(np.asarray(gd)).all()
        assert (dd > 1e-3).mean() < 0.02

    def test_dispatch_gate(self, monkeypatch):
        model, params, rays_o, rays_d, d_init, far = _setup(n_rays=8)
        sgp = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        alpha, beta = model.forward_ab(params)
        kw = dict(alpha_net=alpha, beta_net=beta, far=far,
                  key=jax.random.PRNGKey(4), eps=0.1, max_iter=2,
                  max_bisection=4, final_N_importance=16, N_up=32,
                  perturb=True)
        monkeypatch.setenv("NEURECON_FUSED_FINESAMPLE", "0")
        rd, rb, ri = _fine_sample_dispatch(model, sgp, d_init, rays_o,
                                           rays_d, **kw)
        monkeypatch.setenv("NEURECON_FUSED_FINESAMPLE", "interpret")
        gd, gb, gi = _fine_sample_dispatch(model, sgp, d_init, rays_o,
                                           rays_d, **kw)
        dd = np.abs(np.asarray(gd) - np.asarray(rd))
        assert (dd > 1e-3).mean() < 0.05
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   rtol=1e-3, atol=1e-5)


class TestTrainIntegration:
    def test_ray_loss_matches_xla_path(self, monkeypatch):
        """Full VolSDF loss through the megakernel (interpret gate): same
        key => elementwise-equal fine samples => closely matching loss."""
        from neurecon_tpu.config import ConfigDict
        from neurecon_tpu.models.frameworks.volsdf import make_ray_loss_fn
        from tests.test_volsdf import tiny_model, RENDER_SMALL

        args = ConfigDict({
            "data": {"N_rays": 16},
            "model": {"framework": "VolSDF", "obj_bounding_radius": 3.0},
            "training": {"w_eikonal": 0.1, "speed_factor": 10.0},
        })
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        rays_o, rays_d = _rays(16)
        rb = {"rays_o": rays_o, "rays_d": rays_d,
              "target_rgb": jnp.full((16, 3), 0.5)}
        key = jax.random.PRNGKey(2)

        def total(val):
            monkeypatch.setenv("NEURECON_FUSED_FINESAMPLE", val)
            loss = make_ray_loss_fn(model, args,
                                    {"H": 8, "W": 8, "perturb": True,
                                     **RENDER_SMALL})
            t, _ = jax.jit(lambda p, k: loss(p, rb, k, 0))(params, key)
            return float(t)

        t_xla = total("0")
        t_fused = total("interpret")
        assert np.isfinite(t_fused)
        assert abs(t_xla - t_fused) < 5e-3 * max(1.0, abs(t_xla)), (
            t_xla, t_fused)
