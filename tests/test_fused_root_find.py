"""Fused root-finding megakernel vs root_finding_surface_points.

Deterministic path: interpret mode must agree elementwise (masks equal,
depths to fp tolerance) with the XLA implementation on rays that hit,
miss, and start inside the surface.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.base import ImplicitSurface
from neurecon_tpu.models.frameworks.unisurf import (UNISURF,
                                                    _root_find_dispatch)
from neurecon_tpu.models.ray_casting import root_finding_surface_points
from neurecon_tpu.ops.fused_root_find import fused_root_find


def _rays(n, spread=0.8, seed=0):
    rng = np.random.RandomState(seed)
    th = rng.uniform(-spread, spread, (n, 2)).astype(np.float32)
    d = np.stack([np.sin(th[:, 0]),
                  np.sin(th[:, 1]) * np.cos(th[:, 0]),
                  np.cos(th[:, 1]) * np.cos(th[:, 0])], -1)
    o = np.broadcast_to(np.array([0.0, 0.0, -3.0], np.float32), d.shape)
    return jnp.asarray(o), jnp.asarray(d)


class TestFusedRootFind:
    @pytest.mark.parametrize("fill_inf,logit_tau", [(True, 0.0),
                                                    (False, 0.15)])
    def test_matches_production(self, fill_inf, logit_tau):
        surf = ImplicitSurface(W=64, D=4, skips=[2], embed_multires=4,
                               W_geo_feat=64)
        params = surf.init(jax.random.PRNGKey(0))
        # wide spread: mix of hits and misses of the init sphere
        rays_o, rays_d = _rays(48)
        ref = root_finding_surface_points(
            lambda x: surf.forward(params, x) - 0.0, rays_o, rays_d,
            near=0.0, far=6.0, N_steps=64, logit_tau=logit_tau,
            fill_inf=fill_inf)
        got = fused_root_find(surf, params, rays_o, rays_d, 0.0, 6.0,
                              n_steps=64, logit_tau=logit_tau,
                              fill_inf=fill_inf, tile=16, interpret=True)
        rd, rp, rm, rs = [np.asarray(x) for x in ref]
        gd, gp, gm, gs = [np.asarray(x) for x in got]
        np.testing.assert_array_equal(gm, rm)
        np.testing.assert_array_equal(gs, rs)
        # depths equal on valid rays; misses share the same fill value
        np.testing.assert_allclose(gd[rm], rd[rm], rtol=1e-4, atol=1e-4)
        fin = np.isfinite(rd)
        np.testing.assert_array_equal(np.isfinite(gd), fin)
        np.testing.assert_allclose(gd[fin], rd[fin], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gp[rm], rp[rm], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(gp[~rm], rp[~rm])  # both = ones

    def test_unisurf_dispatch_gate(self, monkeypatch):
        model = UNISURF(surface_cfg=dict(W=64, D=3, skips=[1],
                                         embed_multires=4),
                        radiance_cfg=dict(W=32, D=1, skips=[],
                                          embed_multires=0,
                                          embed_multires_view=0))
        params = model.init(jax.random.PRNGKey(0))
        sgp = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
        rays_o, rays_d = _rays(24, spread=0.4)
        kw = dict(near=jnp.zeros(24), far=jnp.full(24, 6.0), N_steps=64,
                  method="secant", logit_tau=0.0, fill_inf=False)
        monkeypatch.setenv("NEURECON_FUSED_ROOTFIND", "0")
        ref = _root_find_dispatch(model, sgp, rays_o, rays_d, **kw)
        monkeypatch.setenv("NEURECON_FUSED_ROOTFIND", "interpret")
        got = _root_find_dispatch(model, sgp, rays_o, rays_d, **kw)
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(ref[2]))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-4)
