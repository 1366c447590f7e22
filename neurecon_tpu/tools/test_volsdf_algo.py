"""VolSDF sampling-algorithm validation plots (reference
debug_tools/test_volsdf_algo.py): on a closed-form 1-D SDF, plot the true
opacity, the sampled approximation, and the error bound; run fine_sample and
show where the final samples land. (The pytest oracle version of this lives in
tests/test_volsdf.py — this script is the visual twin.)

  python -m neurecon_tpu.tools.test_volsdf_algo --save volsdf_algo.png
"""
from __future__ import annotations

import argparse

import numpy as np


def main(save: str = None, beta_net: float = 0.1, eps: float = 0.1,
         N_init: int = 128):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from neurecon_tpu.models.frameworks.volsdf import (error_bound, fine_sample,
                                                       sdf_to_sigma)

    center, radius, far = 3.0, 1.0, 6.0
    alpha_net = 1.0 / beta_net

    def sdf1d(t):
        return np.abs(t - center) - radius

    def sphere_sdf(pts):
        return jnp.linalg.norm(pts - jnp.array([0.0, 0.0, center]),
                               axis=-1) - radius

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

    # fine_sample
    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.array([[0.0, 0.0, 1.0]])
    d_fine, beta_map, iter_usage = fine_sample(
        sphere_sdf, jnp.asarray(d)[None], rays_o, rays_d, alpha_net, beta_net,
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
    p.add_argument("--beta_net", type=float, default=0.1)
    p.add_argument("--eps", type=float, default=0.1)
    a = p.parse_args()
    main(a.save, a.beta_net, a.eps)
