"""Plot one ray per dataset image in 3D (reference tools/vis_ray.py) —
a quick sanity check that ray directions and camera poses agree.

  python -m neurecon_tpu.tools.vis_ray --config configs/neus.yaml
"""
from __future__ import annotations

import numpy as np


def main_function(args, show: bool = True, save_path: str = None):
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from neurecon_tpu.dataio import get_data
    from neurecon_tpu.ops import get_rays

    dataset = get_data(args)
    H, W = dataset.H, dataset.W

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for i in range(len(dataset)):
        _, model_input, _ = dataset[i]
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(i), jnp.asarray(model_input["c2w"]),
            jnp.asarray(model_input["intrinsics"]), H, W, N_rays=1)
        o = np.asarray(rays_o[0])
        d = np.asarray(rays_d[0])
        d = d / np.linalg.norm(d)
        seg = np.stack([o, o + 2.0 * d])
        ax.plot(seg[:, 0], seg[:, 2], -seg[:, 1], linewidth=0.8)
        ax.scatter(o[0], o[2], -o[1], s=8)
    ax.scatter([0], [0], [0], color="red", s=40)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    if save_path:
        fig.savefig(save_path, dpi=120)
    if show:
        plt.show()
    return fig


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli

    def extra(parser):
        parser.add_argument("--save", type=str, default=None)

    config, _ = parse_cli(extra_args_fn=extra)
    main_function(config, show=config.get("save", None) is None,
                  save_path=config.get("save", None))
