"""VolSDF sampling-algorithm validation plots (reference
debug_tools/test_volsdf_algo.py): on a closed-form 1-D SDF, plot the true
opacity, the sampled approximation, and the error bound; run fine_sample and
show where the final samples land. (The pytest oracle version of this lives in
tests/test_volsdf.py — this script is the visual twin.)

With --load_pt + --config, the validation runs on a REAL trained SDF instead
(reference debug_tools/test_volsdf_algo.py:23-54): the 1-D SDF is the model
queried along a probe ray through the scene, and fine_sample gets the full
3-D network — this checks the sampler against the fields it actually meets
in training, not just the synthetic oracle.

  python -m neurecon_tpu.tools.test_volsdf_algo --save volsdf_algo.png
  python -m neurecon_tpu.tools.test_volsdf_algo --config configs/volsdf.yaml \
      --load_pt logs/exp/ckpts/latest.pt --save volsdf_real.png
"""
from __future__ import annotations

import argparse

import numpy as np


def _load_real_sdf(config_path: str, load_pt: str):
    """(sdf_3d_fn, rays_o [1,3], rays_d [1,3], learned beta) from a trained
    VolSDF checkpoint. The probe ray matches the reference's test ray
    (debug_tools/test_volsdf_algo.py:44-45) rescaled into the scene."""
    import pickle

    import jax.numpy as jnp

    from neurecon_tpu.config import load_yaml
    from neurecon_tpu.models.frameworks import get_model

    cfg = load_yaml(config_path)
    assert cfg.model.framework == "VolSDF", cfg.model.framework
    model, *_ = get_model(cfg)
    with open(load_pt, "rb") as f:
        sd = pickle.load(f)
    import jax
    params = sd["model"] if "model" in sd else sd
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def sdf_fn(pts):
        return model.forward_surface(params, pts)

    _, beta = model.forward_ab(params)
    rays_o = jnp.asarray([[0.8598, 1.0232, -1.4689]])
    rays_d = jnp.asarray([[-0.4857, -0.4841, 0.7386]])
    return sdf_fn, rays_o, rays_d, float(beta)


def main(save: str = None, beta_net: float = 0.1, eps: float = 0.1,
         N_init: int = 128, load_pt: str = None, config: str = None,
         far: float = 6.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from neurecon_tpu.models.frameworks.volsdf import (error_bound, fine_sample,
                                                       sdf_to_sigma)

    if load_pt is not None:
        assert config is not None, "--load_pt needs --config"
        sdf_3d, rays_o, rays_d, beta_net = _load_real_sdf(config, load_pt)
        print(f"loaded {load_pt}: learned beta={beta_net:.5f}")

        def sdf1d(t):
            t = jnp.asarray(np.atleast_1d(t), jnp.float32)
            pts = rays_o + rays_d * t[..., None]
            return np.asarray(sdf_3d(pts))
    else:
        center, radius = 3.0, 1.0

        def sdf1d(t):
            return np.abs(t - center) - radius

        def sdf_3d(pts):
            return jnp.linalg.norm(pts - jnp.array([0.0, 0.0, center]),
                                   axis=-1) - radius

        rays_o = jnp.zeros((1, 3))
        rays_d = jnp.array([[0.0, 0.0, 1.0]])

    alpha_net = 1.0 / beta_net

    # dense ground-truth opacity
    dense_t = np.linspace(0, far + 2, 20000)
    sigma = np.asarray(sdf_to_sigma(jnp.asarray(sdf1d(dense_t)),
                                    alpha_net, beta_net))
    dt = dense_t[1] - dense_t[0]
    R = np.concatenate([[0.0], np.cumsum(0.5 * (sigma[1:] + sigma[:-1]) * dt)])
    O_true = 1 - np.exp(-R)

    # coarse approximation + bound
    d = np.linspace(0, far, N_init)
    sdf = sdf1d(d)
    bounds = np.asarray(error_bound(jnp.asarray(d)[None], jnp.asarray(sdf)[None],
                                    alpha_net, beta_net))[0]
    sig = np.asarray(sdf_to_sigma(jnp.asarray(sdf), alpha_net, beta_net))
    O_hat = 1 - np.exp(-np.cumsum(sig[:-1] * np.diff(d)))
    O_true_at = np.interp(d[1:], dense_t, O_true)
    err = np.abs(O_true_at - O_hat)

    # fine_sample on the full 3-D field (synthetic sphere or the real net)
    d_fine, beta_map, iter_usage = fine_sample(
        sdf_3d, jnp.asarray(d)[None], rays_o, rays_d, alpha_net, beta_net,
        jnp.full((1, 1), far), key=jax.random.PRNGKey(0), eps=eps,
        max_iter=5, max_bisection=10, final_N_importance=64, N_up=128,
        perturb=False)

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 8))
    ax1.plot(dense_t, O_true, label="true opacity")
    ax1.step(d[1:], O_hat, where="post", label=f"approx from {N_init} samples")
    ax1.scatter(np.asarray(d_fine[0]), np.zeros(64), s=6, color="red",
                label="fine_sample output")
    ax1.legend(); ax1.set_xlabel("depth")
    ax1.set_title(f"beta={beta_net}, eps={eps}, iters used="
                  f"{int(iter_usage[0])}, beta_map={float(beta_map[0]):.4f}")

    ax2.step(d[1:], bounds, where="post", label="error bound")
    ax2.step(d[1:], err, where="post", label="actual |error|")
    ax2.set_yscale("log"); ax2.legend(); ax2.set_xlabel("depth")
    print(f"max error {err.max():.4g} <= max bound {bounds.max():.4g}: "
          f"{bool((err <= bounds + 1e-3).all())}")
    if save:
        fig.savefig(save, dpi=120)
        print(f"saved {save}")
    else:
        plt.show()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--save", type=str, default=None)
    p.add_argument("--beta_net", type=float, default=0.1,
                   help="synthetic mode only; --load_pt uses the learned beta")
    p.add_argument("--eps", type=float, default=0.1)
    p.add_argument("--load_pt", type=str, default=None,
                   help="trained VolSDF checkpoint (needs --config)")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--far", type=float, default=6.0)
    a = p.parse_args()
    main(a.save, a.beta_net, a.eps, load_pt=a.load_pt, config=a.config,
         far=a.far)
