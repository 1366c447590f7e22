"""The sphere_residual surface-existence prior (base.py ImplicitSurface).

Round-3 forensics (docs/quality.md) showed the reference SIREN recipe (ref
configs/volsdf_siren.yaml, base.py:284-310 sphere pretrain) collapses into
a constant-SDF basin because the pretrained sphere is destroyed by early
rgb gradients. The prior re-parameterizes sdf = (|x| - r) + f(x) so the
zero-level set exists by construction. These tests pin the parameterization
and its autodiff/fused-path consistency on CPU.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurecon_tpu.models.base import ImplicitSurface, pretrain_siren_sdf


def _make(sphere_residual=True, **kw):
    cfg = dict(W=64, D=4, skips=(), W_geo_feat=64, embed_multires=-1,
               use_siren=True, radius_init=1.0, weight_norm=True,
               sphere_residual=sphere_residual)
    cfg.update(kw)
    return ImplicitSurface(**cfg)


def test_residual_is_exactly_sphere_plus_net():
    surf_r = _make(True)
    surf_p = _make(False)
    params = surf_r.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3), jnp.float32,
                           -2.0, 2.0)
    sphere = jnp.linalg.norm(x, axis=-1) - 1.0
    np.testing.assert_allclose(surf_r.forward(params, x),
                               surf_p.forward(params, x) + sphere,
                               rtol=0, atol=1e-5)


def test_zero_level_set_exists_after_pretrain():
    """Pretrain (target = radius_init sphere) drives f -> 0, so the total
    SDF must cross zero on every radial probe — the property whose absence
    defined the round-3 SIREN collapse."""
    surf = _make(True)
    params = surf.init(jax.random.PRNGKey(0))
    params, losses = pretrain_siren_sdf(
        surf, params, jax.random.PRNGKey(7), num_iters=400, lr=1.5e-4,
        batch_points=1024, target_radius=1.0, obj_bounding_size=3.0)
    assert float(losses[-1]) < 0.1
    for ax in range(3):
        for sign in (1.0, -1.0):
            u = jnp.zeros((3,)).at[ax].set(sign)
            ts = jnp.linspace(0.05, 2.5, 64)
            vals = surf.forward(params, ts[:, None] * u[None, :])
            assert float(vals[0]) < 0 < float(vals[-1]), (ax, sign)


def test_nablas_match_autodiff_of_forward():
    """forward_with_nablas' jnp path must be the exact grad of forward —
    including the analytic sphere term (finite at the origin)."""
    surf = _make(True)
    params = surf.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3), jnp.float32,
                           -1.5, 1.5)
    sdf, nablas, h = surf.forward_with_nablas(params, x)
    g = jax.vmap(jax.grad(lambda p: surf.forward(params, p[None])[0]))(x)
    np.testing.assert_allclose(nablas, g, rtol=0, atol=1e-5)
    # eikonal sanity: with f not yet ~0 the norm is not exactly 1, but the
    # sphere term guarantees it is bounded away from 0 at init
    assert float(jnp.min(jnp.linalg.norm(nablas, axis=-1))) > 0.05


@pytest.mark.parametrize("gate", ["NEURECON_FUSED_NABLAS",
                                  "NEURECON_FUSED_NABLAS_VJP"])
def test_fused_paths_carry_the_sphere_terms(gate):
    """The fused kernels compute the NET only; _add_sphere_terms must add
    the analytic sdf/nablas outside the kernel (interpret mode on CPU)."""
    surf = ImplicitSurface(W=64, D=4, skips=(2,), W_geo_feat=64,
                           embed_multires=2, use_siren=False,
                           radius_init=1.0, sphere_residual=True)
    params = surf.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(3), (32, 3), jnp.float32,
                           -1.2, 1.2)
    ref = surf.forward_with_nablas(params, x)
    prior = os.environ.get(gate)
    os.environ[gate] = "interpret"
    try:
        got = surf.forward_with_nablas(params, x)
    finally:
        if prior is None:
            del os.environ[gate]
        else:
            os.environ[gate] = prior
    for r, g in zip(ref[:2], got[:2]):
        np.testing.assert_allclose(g, r, rtol=0, atol=2e-4)


def test_config_plumbing_volsdf():
    """model.surface.sphere_residual reaches the ImplicitSurface for the
    SIREN recipe's framework."""
    from neurecon_tpu.config import load_yaml
    from neurecon_tpu.models.frameworks import get_model
    args = load_yaml("configs/siren_residual_sphere.yaml")
    model, *_ = get_model(args)
    assert model.implicit_surface.sphere_residual is True
    assert model.implicit_surface.use_siren is True
