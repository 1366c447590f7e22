"""Camera-extrinsics frustum visualization with matplotlib.

Reference-functionality port of tools/vis_camera.py (239 lines, adapted there
from OpenCV's camera_calibration_show_extrinsics sample): per-camera
jet-colormap colors + index labels, image-plane rectangle with an
up-direction triangle, optional camera frame axes, equal-range axis limits
centered on the scene, matplotlib frame (x, z, -y). The construction here is
vectorized over cameras (one line-collection per camera model segment)
instead of the reference's per-point homogeneous-matrix loops.

  python -m neurecon_tpu.tools.vis_camera --config configs/neus.yaml \
      [--save out.png] [--frame_axes]
"""
from __future__ import annotations

import numpy as np


def camera_wire_model(K: np.ndarray, cam_width=0.032, cam_height=0.024,
                      scale_focal=40.0, frame_axes: bool = False):
    """Polyline segments (camera frame) of one camera glyph.

    Returns a list of [P, 3] arrays: image-plane rectangle, up-direction
    triangle, 4 apex-to-corner edges, and (optionally) the 3 frame axes.
    The focal scaling follows the reference: f = scale_focal * 2/(fx+fy).
    """
    f = scale_focal * 2.0 / (K[0, 0] + K[1, 1])
    w, h = cam_width, cam_height
    rect = np.array([[-w, h, f], [w, h, f], [w, -h, f], [-w, -h, f],
                     [-w, h, f]], dtype=np.float64)
    # triangle above the image plane marks the camera's up (-y) direction
    tri = np.array([[-w, -h, f], [0, -2 * h, f], [w, -h, f]], dtype=np.float64)
    apex = [np.array([[0, 0, 0], c]) for c in rect[:4]]
    segs = [rect, tri] + apex
    if frame_axes:
        for axis in np.eye(3) * (f / 2):
            segs.append(np.array([[0, 0, 0], axis]))
    return segs


def _to_plot_frame(pts_world: np.ndarray) -> np.ndarray:
    """World (OpenCV convention) -> matplotlib (x, z, -y)."""
    return np.stack([pts_world[..., 0], pts_world[..., 2], -pts_world[..., 1]],
                    axis=-1)


def draw_camera(ax, K, cam_width, cam_height, scale_focal, extrinsics,
                annotate: bool = True, frame_axes: bool = False,
                color=None):
    """Draw one frustum glyph per w2c matrix in `extrinsics` [N, 4, 4].

    Per-camera colors walk the jet colormap (reference behavior) unless a
    fixed `color` is given. Returns (min_values, max_values) over all drawn
    points in the plot frame, for equal-range axis limits.
    """
    from matplotlib import cm

    segs = camera_wire_model(K, cam_width, cam_height, scale_focal, frame_axes)
    n = len(extrinsics)
    colors = ([color] * n if color is not None
              else [cm.jet(x) for x in np.linspace(0.0, 1.0, max(n, 2))])
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for i, w2c in enumerate(extrinsics):
        c2w = np.linalg.inv(w2c)
        for seg in segs:
            world = seg @ c2w[:3, :3].T + c2w[:3, 3]
            p = _to_plot_frame(world)
            ax.plot(p[:, 0], p[:, 1], p[:, 2], color=colors[i], linewidth=0.9)
            lo = np.minimum(lo, p.min(0))
            hi = np.maximum(hi, p.max(0))
        if annotate:
            apex = _to_plot_frame(c2w[:3, 3])
            ax.text(apex[0], apex[1], apex[2], str(i), color=colors[i],
                    fontsize=8)
    return lo, hi


def set_equal_range(ax, lo, hi):
    """Cubic axis limits centered on the drawn content (the reference computes
    max_range over xyz and sets symmetric limits; ax.set_aspect('equal') is
    unreliable on 3-D axes)."""
    mid = (lo + hi) / 2.0
    r = float((hi - lo).max()) / 2.0 or 1.0
    ax.set_xlim(mid[0] - r, mid[0] + r)
    ax.set_ylim(mid[1] - r, mid[1] + r)
    ax.set_zlim(mid[2] - r, mid[2] + r)


def visualize(camera_matrix: np.ndarray, extrinsics: np.ndarray,
              annotate: bool = True, frame_axes: bool = False,
              show: bool = True, save_path: str = None,
              cam_width=0.032, cam_height=0.024, scale_focal=40.0):
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    lo, hi = draw_camera(ax, camera_matrix, cam_width, cam_height, scale_focal,
                         extrinsics, annotate, frame_axes)
    ax.scatter([0], [0], [0], color="red", s=40)  # scene origin
    lo = np.minimum(lo, 0)
    hi = np.maximum(hi, 0)
    set_equal_range(ax, lo, hi)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    ax.set_title("Extrinsic Parameters Visualization")
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
        parser.add_argument("--frame_axes", action="store_true",
                            help="draw per-camera xyz frame axes")

    config, args = parse_cli(extra_args_fn=extra)
    dataset = get_data(config)
    extr = np.linalg.inv(np.asarray(dataset.c2w_all))
    K = np.asarray(dataset.intrinsics_all[0])[:3, :3]
    visualize(K, extr, frame_axes=bool(config.get("frame_axes", False)),
              show=config.get("save", None) is None,
              save_path=config.get("save", None))
