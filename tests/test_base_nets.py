"""Tests for network primitives: init parity properties, nablas, grad-of-grad."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.base import (
    Embedder,
    ImplicitSurface,
    NeRF,
    RadianceNet,
    count_parameters,
)


class TestEmbedder:
    def test_order_and_dims(self):
        emb = Embedder(3, 2)  # freqs 1, 2
        x = jnp.array([[0.1, 0.2, 0.3]])
        out = np.asarray(emb(x))
        assert out.shape == (1, 3 + 3 * 2 * 2)
        np.testing.assert_allclose(out[0, :3], [0.1, 0.2, 0.3], rtol=1e-6)
        np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, 0.2, 0.3]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 6:9], np.cos([0.1, 0.2, 0.3]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 9:12], np.sin([0.2, 0.4, 0.6]), rtol=1e-5)

    def test_identity_when_negative(self):
        emb = Embedder(3, -1)
        x = jnp.ones((4, 3))
        assert emb(x).shape == (4, 3) and emb.out_dim == 3


class TestImplicitSurface:
    def test_geometric_init_is_sphere(self):
        """After IDR geometric init, sdf(x) ≈ |x| - radius_init."""
        surf = ImplicitSurface(radius_init=0.75)
        params = surf.init(jax.random.PRNGKey(0))
        pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3), minval=-1.5, maxval=1.5)
        sdf = np.asarray(surf.forward(params, pts))
        gt = np.linalg.norm(np.asarray(pts), axis=-1) - 0.75
        # the init is approximate — the torch reference recipe itself gives
        # median |err| ≈ 0.18 and corr ≈ 0.85 on this distribution
        err = np.abs(sdf - gt)
        assert np.median(err) < 0.25, np.median(err)
        assert np.corrcoef(sdf, gt)[0, 1] > 0.9

    def test_nablas_match_finite_differences(self):
        surf = ImplicitSurface(W=64, D=4, skips=[2], W_geo_feat=32, embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        x = jnp.array([[0.3, -0.2, 0.5], [0.9, 0.1, -0.4]])
        sdf, nablas, h = surf.forward_with_nablas(params, x)
        assert sdf.shape == (2,) and nablas.shape == (2, 3) and h.shape == (2, 32)
        eps = 1e-3
        for i in range(3):
            dx = jnp.zeros((1, 3)).at[0, i].set(eps)
            fd = (surf.forward(params, x + dx) - surf.forward(params, x - dx)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(nablas[:, i]), np.asarray(fd),
                                       rtol=1e-2, atol=1e-3)

    def test_nablas_near_unit_norm_at_init(self):
        """Geometric sphere init implies |∇sdf| ≈ 1 away from the center."""
        surf = ImplicitSurface(radius_init=0.5)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(2), (256, 3)) * 0.8
        _, nablas, _ = surf.forward_with_nablas(params, x)
        norms = np.asarray(jnp.linalg.norm(nablas, axis=-1))
        assert 0.7 < np.median(norms) < 1.3

    def test_grad_of_grad_through_eikonal(self):
        """Eikonal loss (‖∇sdf‖−1)² must be differentiable wrt params."""
        surf = ImplicitSurface(W=32, D=2, skips=[], W_geo_feat=16, embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))

        def loss(p):
            _, nablas, _ = surf.forward_with_nablas(p, x)
            return jnp.mean((jnp.linalg.norm(nablas, axis=-1) - 1.0) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    def test_nerf_like_geo_feature(self):
        surf = ImplicitSurface(W=64, D=3, skips=[], W_geo_feat=-1, embed_multires=2)
        params = surf.init(jax.random.PRNGKey(0))
        sdf, h = surf.forward(params, jnp.ones((5, 3)), return_h=True)
        assert h.shape == (5, 64)  # last hidden layer

    def test_siren_shapes(self):
        surf = ImplicitSurface(W=64, D=3, skips=[], W_geo_feat=32,
                               use_siren=True, embed_multires=-1)
        params = surf.init(jax.random.PRNGKey(0))
        sdf = surf.forward(params, jnp.ones((4, 3)))
        assert sdf.shape == (4,)
        # SIREN first-layer weights bounded by 1/in_dim
        w = np.asarray(params["layers"][0]["v"])
        assert np.abs(w).max() <= 1.0 / 3 + 1e-6


class TestRadianceAndNeRF:
    def test_radiance_output_in_01(self):
        rad = RadianceNet(D=2, W=64, W_geo_feat=32, embed_multires=-1,
                          embed_multires_view=2)
        params = rad.init(jax.random.PRNGKey(0))
        x = jnp.ones((7, 3)); v = jnp.ones((7, 3)); n = jnp.ones((7, 3))
        gf = jnp.ones((7, 32))
        out = np.asarray(rad.forward(params, x, v, n, gf))
        assert out.shape == (7, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_nerf_bg_shapes(self):
        nerf = NeRF(input_ch=4, multires=10, multires_view=4, use_view_dirs=True)
        params = nerf.init(jax.random.PRNGKey(0))
        x = jnp.ones((5, 4)); v = jnp.ones((5, 3))
        sigma, rgb = nerf.forward(params, x, v)
        assert sigma.shape == (5,) and rgb.shape == (5, 3)
        assert count_parameters(params) > 100_000
