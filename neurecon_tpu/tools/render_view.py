"""Free-viewpoint video rendering from a trained checkpoint.

  python -m neurecon_tpu.tools.render_view --config configs/neus.yaml \
      --load_pt logs/neus_65/ckpts/latest.pt --camera_path small_circle \
      --camera_inds 11,14,17 --num_views 60

Mirrors the reference tools/render_view.py: checkpoint loading (auto-pick
newest), optional surface-render swap (--use_surface_render sphere_tracing|
root_finding, ~100x faster), optional radiance-net swap (--alter_radiance),
resolution override with intrinsics rescale, five camera paths, rgb / depth /
normal mp4 outputs, and mesh compositing: `--render_mesh mesh.ply` rasterizes
the extracted mesh along the same camera path with the pure-numpy z-buffer
renderer (tools/mesh_raster.py) and writes a side-by-side rgb&mesh video —
the role Open3D's offscreen renderer plays in the reference
(render_view.py:438-453,478-486; that GL stack has no place on a headless
TPU host).
"""
from __future__ import annotations

import os
import pickle
import time

import numpy as np

from neurecon_tpu.tools.camera_paths import generate_camera_path
from neurecon_tpu.utils import io as io_util
from neurecon_tpu.utils.checkpoints import sorted_ckpts
from neurecon_tpu.utils.console import log


def main_function(args):
    import jax
    import jax.numpy as jnp

    from neurecon_tpu.dataio import get_data
    from neurecon_tpu.models.frameworks import get_model
    from neurecon_tpu.ops import get_rays
    from neurecon_tpu.training import render_full_image

    if args.get("fused_kernels", False):
        io_util.enable_fused_kernels()
    io_util.cond_mkdir(args.get("outdir", "./out"))

    model, _trainer, render_kwargs_train, render_kwargs_test, render_factory = \
        get_model(args)

    if args.get("load_pt", None) is None:
        ckpt_file = sorted_ckpts(os.path.join(args.training.exp_dir, "ckpts"))[-1]
    else:
        ckpt_file = args.load_pt
    log.info("=> Use ckpt: " + str(ckpt_file))
    with open(ckpt_file, "rb") as f:
        state_dict = pickle.load(f)
    params = jax.tree_util.tree_map(jnp.asarray, state_dict["model"])
    # volume renders use the sampling schedule the checkpoint was trained
    # with (e.g. UNISURF's decayed interval Δ); surface renders don't sample
    from neurecon_tpu.models.frameworks import checkpoint_render_kwargs
    step_kwargs = checkpoint_render_kwargs(
        args, int(state_dict.get("global_step", -1)))

    if args.get("alter_radiance", None) is not None:
        with open(args.alter_radiance, "rb") as f:
            alt = pickle.load(f)
        params["radiance_net"] = jax.tree_util.tree_map(
            jnp.asarray, alt["model"]["radiance_net"])
        log.info(f"=> Swapped radiance net from {args.alter_radiance}")

    if args.get("downscale", None):
        args.data["downscale"] = args.downscale
    dataset = get_data(args)
    intrinsics = np.array(dataset.intrinsics_all[0], np.float32)
    H, W = dataset.H, dataset.W
    # fx/cy scale with H, fy/cx with W (keep aspect per axis)
    if args.get("H_out", None):
        intrinsics[1, 2] *= args.H_out / H
        intrinsics[1, 1] *= args.H_out / H
        H = int(args.H_out)
    if args.get("W_out", None):
        intrinsics[0, 2] *= args.W_out / W
        intrinsics[0, 0] *= args.W_out / W
        W = int(args.W_out)
    log.info(f"=> Rendering resolution @ [{H} x {W}]")

    c2ws = np.asarray(dataset.c2w_all)
    render_c2ws = generate_camera_path(
        args.get("camera_path", "interpolation"), c2ws,
        int(args.get("num_views", 60)), args.get("camera_inds", "11,15"))
    log.info(f"=> Camera path: {args.get('camera_path', 'interpolation')} "
             f"({len(render_c2ws)} views)")

    use_surface = args.get("use_surface_render", None)
    if use_surface:
        assert use_surface in ("sphere_tracing", "root_finding")
        from neurecon_tpu.models.ray_casting import make_surface_render_fn
        # cast range must cover camera -> far side of the object: derive it
        # from the render path's own camera distances (a fixed 2R*1.2 was a
        # bug — cameras orbit OUTSIDE the object bound, so the march stopped
        # short of the surface and rendered nothing)
        cam_dist = float(np.linalg.norm(np.asarray(render_c2ws)[:, :3, 3],
                                        axis=-1).max())
        far = 1.2 * (cam_dist + args.model.get("obj_bounding_radius", 1.0))
        cast_cfg = {"near": 0.0, "far": far}
        if use_surface == "root_finding":
            cast_cfg["N_steps"] = 128
        render_fn = make_surface_render_fn(model, ray_casting_algo=use_surface,
                                           ray_casting_cfgs=cast_cfg)
        normal_key = "normals_surface"
        step_kwargs = {}
    else:
        kwargs = {k: v for k, v in render_kwargs_test.items()
                  if k not in ("H", "W", "rayschunk")}
        render_fn = render_factory(detailed_output=False, calc_normal=True,
                                   **kwargs)
        normal_key = "normals_volume"

    mesh = None
    if args.get("render_mesh", None):
        from neurecon_tpu.tools.mesh_raster import rasterize_mesh
        from neurecon_tpu.utils.mesh import read_ply
        mesh = read_ply(args.render_mesh)
        log.info(f"=> Compositing mesh {args.render_mesh} "
                 f"({len(mesh[0])} verts, {len(mesh[1])} faces)")

    rgb_imgs, depth_imgs, normal_imgs, mesh_imgs = [], [], [], []
    rayschunk = int(args.get("rayschunk", 4096))
    t_start = time.time()
    for i, c2w in enumerate(render_c2ws):
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(0), jnp.asarray(c2w, jnp.float32),
            jnp.asarray(intrinsics), H, W, N_rays=-1)
        cull_r = None
        if args.get("cull_miss", False):
            # host-side empty-space skip: only rays that hit the bounding
            # sphere go through the network (training.render_full_image)
            cull_r = float(args.model.get("obj_bounding_radius", 1.0))
        ret = render_full_image(render_fn, params, rays_o, rays_d,
                                jax.random.PRNGKey(i), rayschunk=rayschunk,
                                microchunk=int(args.get("microchunk", 0)) or None,
                                microchunk_unroll=bool(
                                    args.get("microchunk_unroll", False)),
                                cull_sphere_r=cull_r,
                                miss_rgb=1.0 if render_kwargs_test.get(
                                    "white_bkgd", False) else 0.0,
                                **step_kwargs)
        rgb_imgs.append(ret["rgb"].reshape(H, W, 3))
        depth = ret["depth_volume"] if "depth_volume" in ret else ret["depth"]
        depth = np.nan_to_num(depth.reshape(H, W, 1), posinf=0.0)
        depth_imgs.append(depth / (depth.max() + 1e-10))
        normal_imgs.append(ret[normal_key].reshape(H, W, 3) / 2.0 + 0.5)
        if mesh is not None:
            from neurecon_tpu.tools.mesh_raster import rasterize_mesh
            mrgb, _, _ = rasterize_mesh(mesh[0], mesh[1], np.asarray(c2w),
                                        intrinsics, H, W)
            mesh_imgs.append(mrgb)
        log.info(f"  rendered view {i + 1}/{len(render_c2ws)} "
                 f"(+{time.time() - t_start:.1f}s)")
        if i == 0:  # view 1 includes program compile; time the steady state
            t_start = time.time()

    outbase = args.get("outbase", None) or args.expname
    post_fix = f"{H}x{W}_{len(render_c2ws)}_{args.get('camera_path', 'interpolation')}"
    if use_surface:
        post_fix += f"_{use_surface}"
    outdir = args.get("outdir", "./out")
    io_util.save_video(np.stack(rgb_imgs),
                       os.path.join(outdir, f"{outbase}_rgb_{post_fix}.mp4"),
                       fps=int(args.get("fps", 30)))
    io_util.save_video(np.stack(depth_imgs).repeat(3, -1),
                       os.path.join(outdir, f"{outbase}_depth_{post_fix}.mp4"),
                       fps=int(args.get("fps", 30)))
    io_util.save_video(np.stack(normal_imgs),
                       os.path.join(outdir, f"{outbase}_normal_{post_fix}.mp4"),
                       fps=int(args.get("fps", 30)))
    both = np.concatenate([np.stack(rgb_imgs), np.stack(normal_imgs)], axis=1)
    io_util.save_video(both,
                       os.path.join(outdir, f"{outbase}_rgb&normal_{post_fix}.mp4"),
                       fps=int(args.get("fps", 30)))
    if mesh_imgs:  # side-by-side rgb&mesh (ref render_view.py:478-486)
        combo = np.concatenate([np.stack(rgb_imgs), np.stack(mesh_imgs)], axis=2)
        io_util.save_video(combo,
                           os.path.join(outdir, f"{outbase}_rgb&mesh_{post_fix}.mp4"),
                           fps=int(args.get("fps", 30)))
    log.info(f"=> Wrote videos to {outdir}")


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli

    def extra(parser):
        parser.add_argument("--num_views", type=int, default=60)
        parser.add_argument("--downscale", type=float, default=1)
        parser.add_argument("--rayschunk", type=int, default=4096)
        parser.add_argument("--microchunk", type=int, default=0,
                            help="rays per lax.map block inside one dispatch "
                                 "(caps activation memory at large rayschunk)")
        parser.add_argument("--fused_kernels", action="store_true",
                            help="enable the eval-path Pallas megakernels")
        parser.add_argument("--cull_miss", action="store_true",
                            help="skip rays that miss the bounding sphere "
                                 "(host-side partition; volume mode only, "
                                 "not for nerf++-outside models)")
        parser.add_argument("--microchunk_unroll", action="store_true",
                            help="walk micro blocks with straight-line XLA "
                                 "instead of lax.map — the TPU workaround for "
                                 "sharp-s NeuS normal renders (docs/methods.md)")
        parser.add_argument("--camera_path", type=str, default="interpolation")
        parser.add_argument("--camera_inds", type=str, default="11,15")
        parser.add_argument("--load_pt", type=str, default=None)
        parser.add_argument("--H_out", type=int, default=None)
        parser.add_argument("--W_out", type=int, default=None)
        parser.add_argument("--fps", type=int, default=30)
        parser.add_argument("--alter_radiance", type=str, default=None)
        parser.add_argument("--outbase", type=str, default=None)
        parser.add_argument("--outdir", type=str, default="./out")
        parser.add_argument("--use_surface_render", type=str, default=None)
        parser.add_argument("--render_mesh", type=str, default=None,
                            help="extracted .ply to rasterize + composite")

    config, _ = parse_cli(extra_args_fn=extra)
    main_function(config)
