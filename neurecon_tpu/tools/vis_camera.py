"""Camera-extrinsics frustum visualization with matplotlib
(reference tools/vis_camera.py, same axis convention: plots x, z, -y).

  python -m neurecon_tpu.tools.vis_camera --config configs/neus.yaml
"""
from __future__ import annotations

import numpy as np


def frustum_points(K: np.ndarray, w2c: np.ndarray, cam_width=0.32,
                   cam_height=0.24, scale_focal=600.0):
    """5 corner points (apex + 4 image-plane corners) of one camera frustum in
    world coordinates."""
    f = scale_focal / K[0, 0]
    c2w = np.linalg.inv(w2c)
    pts_cam = np.array([
        [0, 0, 0],
        [-cam_width, -cam_height, f],
        [cam_width, -cam_height, f],
        [cam_width, cam_height, f],
        [-cam_width, cam_height, f],
    ])
    return pts_cam @ c2w[:3, :3].T + c2w[:3, 3]


def draw_camera(ax, K, cam_width, cam_height, scale_focal, extrinsics,
                annotate: bool = False):
    """Draw all camera frustums; returns (min_values, max_values) over points."""
    all_pts = []
    for i, w2c in enumerate(extrinsics):
        p = frustum_points(K, w2c, cam_width, cam_height, scale_focal)
        all_pts.append(p)
        # frustum edges: apex to corners + image-plane rectangle
        edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
        for a, b in edges:
            ax.plot([p[a, 0], p[b, 0]], [p[a, 2], p[b, 2]],
                    [-p[a, 1], -p[b, 1]], color="C0", linewidth=0.8)
        if annotate:
            ax.text(p[0, 0], p[0, 2], -p[0, 1], str(i), fontsize=8)
    all_pts = np.concatenate(all_pts, 0)
    return all_pts.min(0), all_pts.max(0)


def visualize(camera_matrix: np.ndarray, extrinsics: np.ndarray,
              annotate: bool = True, show: bool = True, save_path: str = None):
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    draw_camera(ax, camera_matrix, 0.16, 0.12, 600.0, extrinsics, annotate)
    ax.scatter([0], [0], [0], color="red", s=40)  # scene origin
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    if save_path:
        fig.savefig(save_path, dpi=120)
    if show:
        plt.show()
    return fig


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli
    from neurecon_tpu.dataio import get_data

    def extra(parser):
        parser.add_argument("--save", type=str, default=None)

    config, args = parse_cli(extra_args_fn=extra)
    dataset = get_data(config)
    extr = np.linalg.inv(np.asarray(dataset.c2w_all))
    K = np.asarray(dataset.intrinsics_all[0])[:3, :3]
    visualize(K, extr, show=config.get("save", None) is None,
              save_path=config.get("save", None))
