"""Visualize camera frustums together with an extracted mesh
(reference tools/vis_surface_and_cam.py; Open3D is not in this image, so the
mesh is drawn as a matplotlib trisurf).

  python -m neurecon_tpu.tools.vis_surface_and_cam --config configs/neus.yaml \
      --mesh logs/exp/meshes/00010000.ply --save out.png
"""
from __future__ import annotations

import numpy as np


def main_function(args, mesh_path: str, show: bool = True, save_path: str = None):
    import matplotlib.pyplot as plt

    from neurecon_tpu.dataio import get_data
    from neurecon_tpu.tools.vis_camera import draw_camera
    from neurecon_tpu.utils.mesh import read_ply

    dataset = get_data(args)
    extr = np.linalg.inv(np.asarray(dataset.c2w_all))
    K = np.asarray(dataset.intrinsics_all[0])[:3, :3]

    verts, faces = read_ply(mesh_path)
    # subsample triangles for plottability
    if len(faces) > 20000:
        sel = np.random.RandomState(0).choice(len(faces), 20000, replace=False)
        faces = faces[sel]

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_trisurf(verts[:, 0], verts[:, 2], -verts[:, 1], triangles=faces,
                    color="lightgrey", alpha=0.6, linewidth=0)
    draw_camera(ax, K, 0.16, 0.12, 600.0, extr, annotate=True)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    if save_path:
        fig.savefig(save_path, dpi=120)
    if show:
        plt.show()
    return fig


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli

    def extra(parser):
        parser.add_argument("--mesh", type=str, required=True)
        parser.add_argument("--save", type=str, default=None)

    config, _ = parse_cli(extra_args_fn=extra)
    main_function(config, config.mesh, show=config.get("save", None) is None,
                  save_path=config.get("save", None))
