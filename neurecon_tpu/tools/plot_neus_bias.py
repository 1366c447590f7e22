"""NeuS unbiasedness demo (reference debug_tools/plot_neus_bias.py, minus the
broken import and the interactive slider): for a synthetic 1-D SDF, plot the
NeuS visibility weights against a naive sdf→σ baseline and mark the true
surface. The NeuS weight maximum must coincide with the zero crossing.

  python -m neurecon_tpu.tools.plot_neus_bias --save neus_bias.png
"""
from __future__ import annotations

import argparse

import numpy as np


def fake_1d_sdf(d, surface_at=1.3, slope=1.0):
    return slope * (surface_at - d)


def neus_weights(sdf, s):
    import jax.numpy as jnp
    from neurecon_tpu.models.frameworks.neus import sdf_to_w
    cdf, alpha, w = sdf_to_w(jnp.asarray(sdf)[None], s)
    return np.asarray(w[0])


def naive_weights(sdf, d, s):
    """Naive logistic-density sdf→σ (the biased construction NeuS §3.1 argues
    against)."""
    sigma = s * np.exp(-s * sdf) / (1 + np.exp(-s * sdf)) ** 2
    delta = np.diff(d)
    alpha = 1 - np.exp(-sigma[:-1] * delta)
    T = np.cumprod(np.concatenate([[1.0], 1 - alpha + 1e-10]))[:-1]
    return alpha * T


def main(save: str = None, s: float = 64.0, surface_at: float = 1.3):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = np.linspace(0.0, 2.5, 257)
    sdf = fake_1d_sdf(d, surface_at)
    d_mid = 0.5 * (d[1:] + d[:-1])

    w_neus = neus_weights(sdf, s)
    w_naive = naive_weights(sdf, d, s)

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(d_mid, w_neus / w_neus.max(), label="NeuS weights (unbiased)")
    ax.plot(d_mid, w_naive / w_naive.max(), "--", label="naive sdf->sigma weights")
    ax.axvline(surface_at, color="k", lw=0.8, label="true surface")
    ax.set_xlabel("depth"); ax.set_ylabel("normalized weight")
    ax.legend(); ax.set_title(f"s={s}")
    peak = d_mid[np.argmax(w_neus)]
    print(f"NeuS weight peak at {peak:.4f} (true surface {surface_at}); "
          f"naive peak at {d_mid[np.argmax(w_naive)]:.4f}")
    if save:
        fig.savefig(save, dpi=120)
        print(f"saved {save}")
    else:
        plt.show()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--save", type=str, default=None)
    p.add_argument("--s", type=float, default=64.0)
    a = p.parse_args()
    main(a.save, a.s)
