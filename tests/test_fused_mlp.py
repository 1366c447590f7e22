"""Fused Pallas SDF-MLP kernel vs the reference jnp forward (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.base import ImplicitSurface
from neurecon_tpu.ops.fused_mlp import fused_sdf_forward


CONFIGS = [
    dict(W=256, D=8, skips=[4], W_geo_feat=256, embed_multires=6),   # flagship
    dict(W=128, D=4, skips=[2], W_geo_feat=64, embed_multires=4),
    dict(W=256, D=8, skips=[], W_geo_feat=-1, embed_multires=6),     # NeRF-like
    dict(W=256, D=5, skips=[], W_geo_feat=256, embed_multires=-1,
         use_siren=True),                                            # SIREN
]


class TestFusedMLP:
    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_matches_reference_forward(self, cfg):
        surf = ImplicitSurface(**cfg)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (700, 3)) * 0.8
        ref = surf.forward(params, x)
        fused = fused_sdf_forward(surf, params, x, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_arbitrary_leading_shape_and_padding(self):
        surf = ImplicitSurface(W=128, D=3, skips=[], W_geo_feat=32,
                               embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        # M = 5*7 = 35, far from the tile size: exercises row padding
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 7, 3))
        ref = surf.forward(params, x)
        fused = surf.forward_fast(params, x)
        assert fused.shape == (5, 7)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_jittable(self):
        surf = ImplicitSurface(W=128, D=3, skips=[1], W_geo_feat=32,
                               embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (300, 3))
        f = jax.jit(lambda p, x: fused_sdf_forward(surf, p, x, tile=256,
                                                   interpret=True))
        np.testing.assert_allclose(np.asarray(f(params, x)),
                                   np.asarray(surf.forward(params, x)),
                                   rtol=1e-4, atol=1e-5)
