"""Numerical-equivalence guards for performance restructurings."""
import jax
import jax.numpy as jnp
import numpy as np


class TestNeusMergedQuery:
    def test_merged_sections_mids_equals_separate(self):
        """The renderer's single batched sections∪mids query must reproduce
        the reference's two-pass formulation (forward_with_nablas on sections;
        forward_radiance on mids) exactly."""
        from tests.test_neus import tiny_model
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))

        N, P = 8, 12
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (N, 3))
        th = jnp.linspace(-0.2, 0.2, N)
        rays_d = jnp.stack([jnp.sin(th), jnp.zeros(N), jnp.cos(th)], -1)
        d_all = jnp.broadcast_to(jnp.linspace(2.0, 4.0, P), (N, P))
        pts = rays_o[:, None, :] + rays_d[:, None, :] * d_all[..., None]
        d_mid = 0.5 * (d_all[..., 1:] + d_all[..., :-1])
        pts_mid = rays_o[:, None, :] + rays_d[:, None, :] * d_mid[..., None]
        views_mid = jnp.broadcast_to(rays_d[:, None, :], pts_mid.shape)

        # reference formulation: two separate passes
        sdf_ref, nablas_ref, _ = model.forward_with_nablas(params, pts)
        rad_ref = model.forward_radiance(params, pts_mid, views_mid)

        # merged formulation (as used in volume_render_rays)
        pts_all = jnp.concatenate([pts, pts_mid], axis=-2)
        sdf_all, nablas_all, h_all = model.forward_with_nablas(params, pts_all)
        sdf_m, nablas_m = sdf_all[..., :P], nablas_all[..., :P, :]
        rad_m = model.radiance_net.forward(
            params["radiance_net"], pts_mid, views_mid,
            nablas_all[..., P:, :], h_all[..., P:, :])

        np.testing.assert_allclose(np.asarray(sdf_m), np.asarray(sdf_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(nablas_m), np.asarray(nablas_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rad_m), np.asarray(rad_ref),
                                   rtol=1e-5, atol=1e-6)


class TestVolsdfMergedEikonal:
    def test_eik_nablas_match_direct_query(self):
        """eik_pts riding the renderer's query must return the same nablas as
        a direct forward_with_nablas on those points."""
        from tests.test_volsdf import tiny_model, RENDER_SMALL
        from neurecon_tpu.models.frameworks.volsdf import make_volume_render_fn
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(model, perturb=False,
                                       detailed_output=False, **RENDER_SMALL)
        N = 8
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (N, 3))
        rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (N, 3))
        eik_pts = jax.random.uniform(jax.random.PRNGKey(3), (N, 1, 3),
                                     minval=-2.0, maxval=2.0)
        _, _, extras = render(params, rays_o, rays_d, jax.random.PRNGKey(1),
                              eik_pts=eik_pts)
        _, nablas_direct, _ = model.forward_with_nablas(params, eik_pts)
        np.testing.assert_allclose(np.asarray(extras["eik_nablas"]),
                                   np.asarray(nablas_direct),
                                   rtol=1e-4, atol=1e-5)


class TestBatchedRays:
    def test_get_rays_batched_matches_single(self):
        from neurecon_tpu.ops import get_rays
        from neurecon_tpu.utils.camera import look_at
        c2w0 = jnp.asarray(look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3)),
                           jnp.float32)
        c2w1 = jnp.asarray(look_at(np.array([4.0, 0.0, 0.0]), np.zeros(3)),
                           jnp.float32)
        intr = jnp.eye(4).at[0, 0].set(100.0).at[1, 1].set(100.0) \
                  .at[0, 2].set(50.0).at[1, 2].set(40.0)
        key = jax.random.PRNGKey(0)
        c2w_b = jnp.stack([c2w0, c2w1])
        intr_b = jnp.stack([intr, intr])
        ro_b, rd_b, inds_b = get_rays(key, c2w_b, intr_b, 80, 100, N_rays=16)
        # pixel indices are shared across the batch (reference `expand`)
        np.testing.assert_array_equal(np.asarray(inds_b[0]), np.asarray(inds_b[1]))
        ro0, rd0, inds0 = get_rays(key, c2w0, intr, 80, 100, N_rays=16)
        np.testing.assert_allclose(np.asarray(rd_b[0]), np.asarray(rd0),
                                   rtol=1e-6)
        # different cameras give different origins
        assert not np.allclose(np.asarray(ro_b[0]), np.asarray(ro_b[1]))


class TestSplitFinalLayer:
    def test_split_final_matmul_equals_fused(self):
        """ImplicitSurface applies its final 1+W_geo_feat layer as two
        row-sliced matmuls (the fused layer + output slice SIGILLs the TPU
        compiler under the inner jax.grad). Row slicing must be exactly the
        fused affine map, including under weight-norm."""
        from neurecon_tpu.models.base import (ImplicitSurface, apply_linear,
                                              slice_linear_rows)
        surf = ImplicitSurface(W=32, D=3, skips=(2,), W_geo_feat=16,
                               embed_multires=4, weight_norm=True)
        params = surf.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), jnp.float32,
                               -1, 1)

        sdf, h_out = surf.forward(params, x, return_h=True)

        p_fin = params["layers"][surf.D]

        # equivalence of slicing itself on random activations
        h = jax.random.normal(jax.random.PRNGKey(2), (64, surf.W))
        fused = apply_linear(p_fin, h)
        split0 = apply_linear(slice_linear_rows(p_fin, 0, 1), h)
        split1 = apply_linear(slice_linear_rows(p_fin, 1, None), h)
        np.testing.assert_allclose(np.asarray(fused[..., :1]),
                                   np.asarray(split0), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused[..., 1:]),
                                   np.asarray(split1), rtol=1e-6, atol=1e-6)

        # and the forward path output must equal the fused formulation
        emb = surf.embed_fn(x)
        hh = emb
        for i in range(surf.D):
            if i in surf.skips:
                hh = jnp.concatenate([hh, emb], -1) / np.sqrt(2)
            hh = apply_linear(params["layers"][i], hh)
            hh = jax.nn.softplus(100.0 * hh) / 100.0
        out = apply_linear(p_fin, hh)
        np.testing.assert_allclose(np.asarray(sdf), np.asarray(out[..., 0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_out), np.asarray(out[..., 1:]),
                                   rtol=1e-5, atol=1e-6)
