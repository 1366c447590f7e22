"""Equivalence tests for the train-path fused nablas kernel (custom VJP).

The op must agree with the plain jnp `ImplicitSurface.forward_with_nablas`
on BOTH the primal outputs and every gradient the train step consumes:
d(loss)/d(params) through the weight-norm reparameterization (including the
second-order eikonal path through φ''), and d(loss)/d(x). Run in Pallas
interpret mode on CPU (the on-chip A/B lives in bench/tools).
Ref being replaced: /root/reference/models/base.py:265-282.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.base import ImplicitSurface
from neurecon_tpu.ops.fused_nablas_vjp import fused_forward_with_nablas_vjp


def _make(use_siren=False, W_geo_feat=256, multires=6, seed=0):
    surface = ImplicitSurface(W=256, D=8, skips=() if use_siren else (4,),
                              W_geo_feat=W_geo_feat, embed_multires=multires,
                              weight_norm=True, use_siren=use_siren)
    params = surface.init(jax.random.PRNGKey(seed))
    return surface, params


def _loss_terms(sdf, nablas, h):
    """A loss touching every output the frameworks touch: rgb-like term on
    h, eikonal on nablas (the grad-of-grad path), plus sdf directly."""
    eik = jnp.mean((jnp.linalg.norm(nablas, axis=-1) - 1.0) ** 2)
    return (jnp.mean(jnp.tanh(sdf) ** 2) + eik
            + jnp.mean(jnp.sin(3.0 * h[..., :8])) )


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)


class TestFusedNablasVJP:
    def test_primal_matches_plain(self):
        surface, params = _make()
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 0.7
        s_ref, n_ref, h_ref = surface.forward_with_nablas(params, x)
        s_k, n_k, h_k = fused_forward_with_nablas_vjp(
            surface, params, x, tile=64, interpret=True)
        assert _rel_err(s_k, s_ref) < 1e-5
        assert _rel_err(n_k, n_ref) < 1e-5
        assert _rel_err(h_k, h_ref) < 1e-5

    def test_param_grads_match_plain(self):
        """The train-step contract: grads of a full (rgb+eikonal+sdf) loss
        wrt the REAL param pytree (v/g/b under weight norm) must match the
        plain jax.grad-of-grad path elementwise."""
        surface, params = _make()
        x = jax.random.normal(jax.random.PRNGKey(2), (64, 3)) * 0.7

        def loss_plain(p):
            return _loss_terms(*surface.forward_with_nablas(p, x))

        def loss_fused(p):
            return _loss_terms(*fused_forward_with_nablas_vjp(
                surface, p, x, tile=64, interpret=True))

        g_ref = jax.grad(loss_plain)(params)
        g_k = jax.grad(loss_fused)(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_k = jax.tree_util.tree_leaves(g_k)
        assert len(flat_ref) == len(flat_k)
        for (path, a), b in zip(flat_ref, flat_k):
            err = _rel_err(b, a)
            assert err < 2e-4, (jax.tree_util.keystr(path), err)

    def test_input_grads_match_plain(self):
        surface, params = _make()
        x = jax.random.normal(jax.random.PRNGKey(3), (32, 3)) * 0.7

        def loss_plain(x_):
            return _loss_terms(*surface.forward_with_nablas(params, x_))

        def loss_fused(x_):
            return _loss_terms(*fused_forward_with_nablas_vjp(
                surface, params, x_, tile=32, interpret=True))

        gx_ref = jax.grad(loss_plain)(x)
        gx_k = jax.grad(loss_fused)(x)
        assert _rel_err(gx_k, gx_ref) < 2e-4

    def test_siren_variant(self):
        surface, params = _make(use_siren=True)
        x = jax.random.normal(jax.random.PRNGKey(4), (32, 3)) * 0.5

        def loss_plain(p):
            return _loss_terms(*surface.forward_with_nablas(p, x))

        def loss_fused(p):
            return _loss_terms(*fused_forward_with_nablas_vjp(
                surface, p, x, tile=32, interpret=True))

        assert _rel_err(loss_fused(params), loss_plain(params)) < 1e-5
        g_ref = jax.tree_util.tree_leaves(jax.grad(loss_plain)(params))
        g_k = jax.tree_util.tree_leaves(jax.grad(loss_fused)(params))
        for a, b in zip(g_ref, g_k):
            assert _rel_err(b, a) < 2e-4

    def test_nonmultiple_tile_padding(self):
        """M not a multiple of the tile: padded rows must not leak into
        outputs or grads."""
        surface, params = _make()
        x = jax.random.normal(jax.random.PRNGKey(5), (37, 3)) * 0.7
        s_ref, n_ref, _ = surface.forward_with_nablas(params, x)
        s_k, n_k, _ = fused_forward_with_nablas_vjp(
            surface, params, x, tile=32, interpret=True)
        assert _rel_err(s_k, s_ref) < 1e-5
        assert _rel_err(n_k, n_ref) < 1e-5

        def loss_fused(p):
            return _loss_terms(*fused_forward_with_nablas_vjp(
                surface, p, x, tile=32, interpret=True))

        def loss_plain(p):
            return _loss_terms(*surface.forward_with_nablas(p, x))

        g_ref = jax.tree_util.tree_leaves(jax.grad(loss_plain)(params))
        g_k = jax.tree_util.tree_leaves(jax.grad(loss_fused)(params))
        for a, b in zip(g_ref, g_k):
            assert _rel_err(b, a) < 2e-4

    def test_full_neus_train_step_grads(self, monkeypatch):
        """Composition: the complete NeuS ray loss (upsampler -> render ->
        rgb+eikonal+mask losses) differentiated wrt params must produce the
        same gradients with the fused-VJP kernel as with the plain path."""
        from __graft_entry__ import _flagship_args
        from neurecon_tpu.models.frameworks.neus import (get_model,
                                                         make_ray_loss_fn)

        args, _, _ = _flagship_args(N_rays=16)
        args.model.surface.update({"W": 64, "D": 3, "skips": [1],
                                   "embed_multires": 4})
        args.model.radiance.update({"W": 32, "D": 2})
        args.model.W_geometry_feature = 64
        model, _tf, kw, _, _ = get_model(args)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(7)
        d = rng.randn(16, 3).astype(np.float32)
        d[:, 2] += 3.0
        rb = {"rays_o": jnp.broadcast_to(
                  jnp.asarray([0.0, 0.0, -3.0]), (16, 3)),
              "rays_d": jnp.asarray(d),
              "target_rgb": jnp.full((16, 3), 0.5),
              "target_mask": jnp.ones((16,), bool)}
        rk = dict(kw)
        rk.update({"H": 4, "W": 4, "perturb": True,
                   "N_samples": 16, "N_importance": 16,
                   "N_upsample_iters": 2})
        key = jax.random.PRNGKey(5)

        def grads(pathval):
            monkeypatch.setenv("NEURECON_FUSED_NABLAS_VJP", pathval)
            loss = make_ray_loss_fn(model, args, rk)
            return jax.grad(
                lambda p: loss(p, rb, key, 0)[0])(params)

        g_ref = grads("0")
        g_k = grads("interpret")
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g_ref),
                jax.tree_util.tree_leaves(g_k)):
            assert _rel_err(b, a) < 5e-4, (jax.tree_util.keystr(path),
                                           _rel_err(b, a))

    @pytest.mark.parametrize("framework", ["volsdf", "unisurf"])
    def test_full_framework_train_step_grads(self, monkeypatch, framework):
        """Composition for the other two frameworks (promotion to default
        covers all three): the complete VolSDF / UNISURF ray loss
        differentiated wrt params must produce the same gradients with the
        fused-VJP kernel as with the plain path."""
        from neurecon_tpu.config import load_yaml

        args = load_yaml(f"configs/synthetic_quality_{framework}.yaml")
        args.model.surface.update({"W": 64, "D": 3, "skips": [1],
                                   "embed_multires": 4})
        args.model.radiance.update({"W": 32, "D": 2})
        args.model.W_geometry_feature = 64
        if framework == "volsdf":
            from neurecon_tpu.models.frameworks.volsdf import (
                get_model, make_ray_loss_fn)
            args.model.max_upsample_iter = 2
            args.model.N_samples = 16
            args.model.N_importance = 8
        else:
            from neurecon_tpu.models.frameworks.unisurf import (
                get_model, make_ray_loss_fn)
            args.model.N_query = 16
            args.model.N_freespace = 8
            args.model.N_steps = 32
        model, _tf, kw, _, _ = get_model(args)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(11)
        d = rng.randn(8, 3).astype(np.float32)
        d[:, 2] += 3.0
        rb = {"rays_o": jnp.broadcast_to(
                  jnp.asarray([0.0, 0.0, -3.0]), (8, 3)),
              "rays_d": jnp.asarray(d),
              "target_rgb": jnp.full((8, 3), 0.5),
              "target_mask": jnp.ones((8,), bool)}
        rk = dict(kw)
        rk.update({"H": 4, "W": 4, "perturb": True})
        key = jax.random.PRNGKey(5)

        def grads(pathval):
            monkeypatch.setenv("NEURECON_FUSED_NABLAS_VJP", pathval)
            loss = make_ray_loss_fn(model, args, rk)
            return jax.grad(
                lambda p: loss(p, rb, key, 0)[0])(params)

        g_ref = grads("0")
        g_k = grads("interpret")
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(g_ref),
                jax.tree_util.tree_leaves(g_k)):
            assert _rel_err(b, a) < 5e-4, (jax.tree_util.keystr(path),
                                           _rel_err(b, a))

    def test_gate_routes_training_path(self, monkeypatch):
        """NEURECON_FUSED_NABLAS_VJP=interpret routes forward_with_nablas
        through the custom-VJP kernel (and composes with jax.grad, unlike
        the eval-only NEURECON_FUSED_NABLAS gate)."""
        monkeypatch.setenv("NEURECON_FUSED_NABLAS_VJP", "interpret")
        surface, params = _make()
        x = jax.random.normal(jax.random.PRNGKey(6), (32, 3)) * 0.7

        def loss(p):
            return _loss_terms(*surface.forward_with_nablas(p, x))

        g = jax.grad(loss)(params)  # must not raise (the VJP exists)
        monkeypatch.delenv("NEURECON_FUSED_NABLAS_VJP")
        g_ref = jax.grad(loss)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g)):
            assert _rel_err(b, a) < 2e-4
