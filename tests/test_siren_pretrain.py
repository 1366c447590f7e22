"""SIREN sphere-pretraining (ref base.py:284-310) converges to the target."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.base import ImplicitSurface, pretrain_siren_sdf


def test_pretrain_siren_to_sphere():
    surf = ImplicitSurface(W=64, D=3, skips=[], W_geo_feat=32,
                           use_siren=True, embed_multires=-1,
                           geometric_init=True, radius_init=0.5)
    params = surf.init(jax.random.PRNGKey(0))

    # before: SIREN init is nowhere near a sphere
    pts = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                             minval=-1.0, maxval=1.0)
    gt = jnp.linalg.norm(pts, axis=-1) - 0.5
    err_before = float(jnp.mean(jnp.abs(surf.forward(params, pts) - gt)))

    new_params, losses = pretrain_siren_sdf(
        surf, params, jax.random.PRNGKey(2), num_iters=800, lr=1e-4,
        batch_points=1024, target_radius=0.5, obj_bounding_size=1.0)

    err_after = float(jnp.mean(jnp.abs(surf.forward(new_params, pts) - gt)))
    assert err_after < 0.3 * err_before, (err_before, err_after)
    assert err_after < 0.08, err_after
    # loss curve decreased
    assert float(losses[-1]) < 0.5 * float(losses[0])
