"""Fused forward+input-gradient kernel vs jax.grad's forward_with_nablas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.base import ImplicitSurface
from neurecon_tpu.ops.fused_nablas import fused_forward_with_nablas


CONFIGS = [
    dict(W=256, D=8, skips=[4], W_geo_feat=256, embed_multires=6),  # flagship
    dict(W=128, D=4, skips=[2], W_geo_feat=64, embed_multires=4),
    dict(W=64, D=3, skips=[], W_geo_feat=32, embed_multires=2),
    dict(W=64, D=4, skips=[], W_geo_feat=64, embed_multires=-1,
         use_siren=True),
]


class TestFusedNablas:
    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_matches_forward_with_nablas(self, cfg):
        surf = ImplicitSurface(**cfg)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 70, 3)) * 0.8
        r_sdf, r_nab, r_h = surf.forward_with_nablas(params, x)
        g_sdf, g_nab, g_h = fused_forward_with_nablas(surf, params, x,
                                                      tile=128,
                                                      interpret=True)
        assert g_sdf.shape == r_sdf.shape
        assert g_nab.shape == r_nab.shape
        assert g_h.shape == r_h.shape
        np.testing.assert_allclose(np.asarray(g_sdf), np.asarray(r_sdf),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_nab), np.asarray(r_nab),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(g_h), np.asarray(r_h),
                                   rtol=1e-4, atol=1e-5)

    def test_gate_routes_eval_query(self, monkeypatch):
        surf = ImplicitSurface(W=64, D=3, skips=[1], W_geo_feat=32,
                               embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
        monkeypatch.setenv("NEURECON_FUSED_NABLAS", "0")
        ref = surf.forward_with_nablas(params, x)
        monkeypatch.setenv("NEURECON_FUSED_NABLAS", "interpret")
        got = surf.forward_with_nablas(params, x)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-3, atol=2e-4)

    def test_eikonal_norm_on_sphere_init(self):
        """Geometric init approximates |x|-r: nabla norms ~ 1 away from the
        origin — a semantic sanity check beyond elementwise parity."""
        surf = ImplicitSurface(W=128, D=4, skips=[2], W_geo_feat=64,
                               embed_multires=6)
        params = surf.init(jax.random.PRNGKey(3))
        x = jax.random.normal(jax.random.PRNGKey(4), (400, 3))
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True) * 0.9
        _, nab, _ = fused_forward_with_nablas(surf, params, x, tile=128,
                                              interpret=True)
        norms = np.linalg.norm(np.asarray(nab), axis=-1)
        assert 0.5 < norms.mean() < 1.5
