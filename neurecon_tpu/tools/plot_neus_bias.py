"""NeuS unbiasedness demo (reference debug_tools/plot_neus_bias.py, minus the
broken `pdf_phi_s` import): plot NeuS visibility weights against a naive
sdf->sigma baseline and mark the true surfaces. The NeuS weight maximum must
coincide with the FIRST zero crossing.

The reference explores the (sample count, sharpness s) space with interactive
sliders (log2(num) in [1,10], log2(s) in [0,10]) on a piecewise 1-D SDF with
TWO surfaces (the second occluded by the first); headless here, the same
space is a panel grid over N x s, with the occlusion case included — the
naive construction leaks weight to the occluded surface and biases the peak,
NeuS does not.

  python -m neurecon_tpu.tools.plot_neus_bias --save neus_bias.png
"""
from __future__ import annotations

import argparse

import numpy as np


def fake_1d_sdf(d, surface_at=1.3, slope=1.0):
    """Single-surface linear SDF."""
    return slope * (surface_at - d)


def two_surface_sdf(d, border_0=1.3, border_1=1.9):
    """Piecewise SDF with two zero crossings: enter at border_0, exit at
    (border_0+border_1)/2, re-enter at border_1 (the reference's occlusion
    oracle — only the FIRST surface should receive visibility weight)."""
    mid = 0.5 * (border_0 + border_1)
    return np.where(d < mid, border_0 - d, d - border_1)


def neus_weights(sdf, s):
    import jax.numpy as jnp
    from neurecon_tpu.models.frameworks.neus import sdf_to_w
    cdf, alpha, w = sdf_to_w(jnp.asarray(sdf)[None], s)
    return np.asarray(w[0])


def naive_weights(sdf, d, s):
    """Naive logistic-density sdf->sigma (the biased construction NeuS §3.1
    argues against)."""
    sigma = s * np.exp(-s * sdf) / (1 + np.exp(-s * sdf)) ** 2
    delta = np.diff(d)
    alpha = 1 - np.exp(-sigma[:-1] * delta)
    T = np.cumprod(np.concatenate([[1.0], 1 - alpha + 1e-10]))[:-1]
    return alpha * T


def _panel(ax, d, sdf, s, surfaces):
    d_mid = 0.5 * (d[1:] + d[:-1])
    w_neus = neus_weights(sdf, s)
    w_naive = naive_weights(sdf, d, s)
    ax.plot(d_mid, w_neus / (w_neus.max() + 1e-12),
            label="NeuS (unbiased)")
    ax.plot(d_mid, w_naive / (w_naive.max() + 1e-12), "--",
            label="naive sdf->sigma")
    for j, sf in enumerate(surfaces):
        ax.axvline(sf, color="k", lw=0.8,
                   label="true surface" if j == 0 else None)
    peak_err = abs(d_mid[np.argmax(w_neus)] - surfaces[0])
    ax.set_title(f"N={len(d)}, s={s:g}: NeuS peak err {peak_err:.3f}",
                 fontsize=9)
    return peak_err


def main(save: str = None, s: float = 64.0, surface_at: float = 1.3,
         occlusion: bool = True):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    Ns = (32, 257)
    ss = (s / 4.0, s, s * 4.0)
    fig, axes = plt.subplots(len(Ns), len(ss), figsize=(5 * len(ss), 3.2 * len(Ns)),
                             sharex=True)
    worst = 0.0
    for r, N in enumerate(Ns):
        d = np.linspace(0.0, 2.5, N)
        if occlusion:
            sdf = two_surface_sdf(d, surface_at, surface_at + 0.6)
            surfaces = (surface_at, surface_at + 0.6)
        else:
            sdf = fake_1d_sdf(d, surface_at)
            surfaces = (surface_at,)
        for c, s_val in enumerate(ss):
            worst = max(worst, _panel(axes[r][c], d, sdf, s_val, surfaces))
    axes[0][0].legend(fontsize=8)
    for ax in axes[-1]:
        ax.set_xlabel("depth")
    for row in axes:
        row[0].set_ylabel("normalized weight")
    fig.suptitle("NeuS unbiased weights vs naive sdf->sigma"
                 + (" (two-surface occlusion SDF)" if occlusion else ""))
    fig.tight_layout()
    print(f"worst NeuS first-surface peak error over the N x s grid: "
          f"{worst:.4f} (grid spacing {2.5 / (min(Ns) - 1):.4f})")
    if save:
        fig.savefig(save, dpi=120)
        print(f"saved {save}")
    else:
        plt.show()
    return worst


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--save", type=str, default=None)
    p.add_argument("--s", type=float, default=64.0)
    p.add_argument("--single_surface", action="store_true",
                   help="use the single linear SDF instead of the "
                        "two-surface occlusion oracle")
    a = p.parse_args()
    main(a.save, a.s, occlusion=not a.single_surface)
