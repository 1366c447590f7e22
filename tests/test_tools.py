"""Tests for tools: camera paths, mesh eval (Chamfer), PSNR, extract_surface."""
import sys
import time

import numpy as np
import pytest

from neurecon_tpu.tools.camera_paths import (
    generate_camera_path,
    poses_avg,
    smoothed_motion_interpolation,
)
from neurecon_tpu.utils.camera import look_at


def ring_poses(n=12, radius=3.0):
    c2ws = []
    for k in range(n):
        th = 2 * np.pi * k / n
        loc = radius * np.array([np.cos(th), -0.2, np.sin(th)])
        c2ws.append(look_at(loc, np.zeros(3)))
    return np.stack(c2ws).astype(np.float32)


class TestCameraPaths:
    def test_smoothed_interpolation_monotone_and_covers_range(self):
        s = smoothed_motion_interpolation(np.pi / 2, 30)
        assert np.all(np.diff(s) > 0)
        assert abs(s[0]) < 1e-9 and abs(s[-1] - np.pi / 2) < 1e-9
        # accel phase: increasing velocity at the start
        v = np.diff(s)
        assert v[0] < v[len(v) // 2]

    @pytest.mark.parametrize("path,inds", [
        ("spiral", None),
        ("interpolation", None),
        ("small_circle", "0,1,2"),
        ("great_circle", "0,3"),
        ("spherical_spiral", "0,1,2"),
    ])
    def test_all_paths_produce_valid_poses(self, path, inds):
        c2ws = ring_poses()
        out = generate_camera_path(path, c2ws, 20, camera_inds=inds or "0,1")
        assert out.shape[0] >= 20 - 1 and out.shape[-2:] == (4, 4)
        R = out[:, :3, :3]
        # rotations orthonormal
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(len(R), 0),
                                   atol=1e-5)
        # cameras look roughly at the origin for circle paths
        if path in ("small_circle", "great_circle"):
            fwd = out[:, :3, 2]
            to_origin = -out[:, :3, 3]
            to_origin /= np.linalg.norm(to_origin, axis=-1, keepdims=True)
            cos = (fwd * to_origin).sum(-1)
            assert np.all(cos > 0.99)

    def test_poses_avg_center(self):
        c2ws = ring_poses()
        avg = poses_avg(c2ws)
        assert np.linalg.norm(avg[:3, 3] - c2ws[:, :3, 3].mean(0)) < 1e-5


class TestMeshRaster:
    def _camera(self, dist=3.0, f=200.0, H=120, W=160):
        c2w = look_at(np.array([0.0, 0.0, -dist]), np.zeros(3))
        K = np.array([[f, 0, W / 2.0, 0], [0, f, H / 2.0, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1.0]])
        return c2w, K, H, W

    def test_single_triangle_depth_and_coverage(self):
        from neurecon_tpu.tools.mesh_raster import rasterize_mesh
        c2w, K, H, W = self._camera()
        # a big triangle in the z=0 plane centered at the origin
        verts = np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.7, 0.0]])
        faces = np.array([[0, 1, 2]])
        rgb, depth, mask = rasterize_mesh(verts, faces, c2w, K, H, W)
        cy, cx = H // 2, W // 2
        assert mask[cy, cx]
        np.testing.assert_allclose(depth[cy, cx], 3.0, atol=1e-6)
        assert not mask[2, 2] and not mask[-2, -2]  # corners empty
        assert np.isinf(depth[2, 2])
        # covered pixel count ~ projected area: f²·area/d² = 200²·0.6/9
        area_px = mask.sum()
        assert abs(area_px - 200.0 ** 2 * 0.6 / 9.0) / area_px < 0.05

    def test_sphere_mesh_silhouette_and_occlusion(self):
        from neurecon_tpu.tools.mesh_raster import rasterize_mesh
        from neurecon_tpu.utils.mesh import marching_tetrahedra
        c2w, K, H, W = self._camera(dist=3.0)
        N, r = 48, 0.5
        g = np.linspace(-0.8, 0.8, N)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        vals = np.sqrt(X**2 + Y**2 + Z**2) - r
        verts, faces = marching_tetrahedra(vals)
        verts = verts / (N - 1) * 1.6 - 0.8  # grid coords -> world
        rgb, depth, mask = rasterize_mesh(verts, faces, c2w, K, H, W)
        cy, cx = H // 2, W // 2
        # front surface of the sphere: depth ~ dist - r (z-buffer keeps the
        # near face, i.e. occlusion works)
        np.testing.assert_allclose(depth[cy, cx], 3.0 - r, atol=0.05)
        # silhouette radius in pixels ~ f * r / sqrt(d² - r²)
        rows = np.where(mask.any(1))[0]
        r_px_meas = (rows.max() - rows.min()) / 2.0
        r_px = 200.0 * r / np.sqrt(3.0**2 - r**2)
        assert abs(r_px_meas - r_px) < 3.0
        # shading varies across the sphere (lambertian, not flat fill)
        inside = rgb[mask]
        assert inside.std() > 0.02


class TestEvalMesh:
    def test_chamfer_zero_for_identical(self):
        from neurecon_tpu.tools.eval_mesh import chamfer_distance, sample_surface
        from neurecon_tpu.utils.mesh import marching_tetrahedra
        ax = np.linspace(-1, 1, 24)
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        vals = np.sqrt(x**2 + y**2 + z**2) - 0.6
        verts, faces = marching_tetrahedra(vals)
        verts = verts * (2.0 / 23) - 1.0
        pts_a = sample_surface(verts, faces, 2000, seed=0)
        pts_b = sample_surface(verts, faces, 2000, seed=1)
        cd, acc, comp = chamfer_distance(pts_a, pts_b)
        assert cd < 0.03  # sampling noise only

    def test_chamfer_detects_scale(self):
        from neurecon_tpu.tools.eval_mesh import chamfer_distance, sample_surface
        from neurecon_tpu.utils.mesh import marching_tetrahedra
        ax = np.linspace(-1, 1, 24)
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        vals = np.sqrt(x**2 + y**2 + z**2) - 0.5
        verts, faces = marching_tetrahedra(vals)
        verts = verts * (2.0 / 23) - 1.0
        pts = sample_surface(verts, faces, 2000)
        cd, *_ = chamfer_distance(pts, pts * 1.4)  # radius 0.5 -> 0.7
        assert abs(cd - 0.2) < 0.03

    def test_empty_mesh_reported_not_crashed(self, tmp_path):
        """A collapsed model (SDF with no zero crossing, the SIREN-VolSDF
        failure mode) yields an empty mesh; the CLI must report it instead
        of crashing in sample_surface's area-weighted rng.choice."""
        import argparse

        from neurecon_tpu.tools.eval_mesh import main_function
        from neurecon_tpu.utils.mesh import marching_tetrahedra, write_ply
        ax = np.linspace(-1, 1, 8)
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        # all-positive field -> no surface
        verts_e, faces_e = marching_tetrahedra(
            np.sqrt(x**2 + y**2 + z**2) + 0.5)
        assert len(faces_e) == 0
        empty, gt = str(tmp_path / "e.ply"), str(tmp_path / "g.ply")
        write_ply(empty, verts_e, faces_e)
        verts, faces = marching_tetrahedra(np.sqrt(x**2 + y**2 + z**2) - 0.6)
        write_ply(gt, verts, faces)
        res = main_function(argparse.Namespace(
            pred=empty, gt=gt, n_samples=100, scale_mat=None))
        assert res["no_surface"] and res["empty"] == "pred"
        assert res["chamfer"] is None


class TestPSNR:
    def test_psnr_values(self):
        from neurecon_tpu.tools.eval_rgb import psnr
        img = np.random.RandomState(0).rand(32, 32, 3)
        assert psnr(img, img) > 100
        noisy = np.clip(img + 0.1, 0, 1)
        p = psnr(noisy, img)
        assert 15 < p < 25


class TestExtractSurfaceCLI:
    def test_extract_surface_from_ckpt(self, tmp_path):
        import pickle
        import jax
        from types import SimpleNamespace
        from neurecon_tpu.models.base import ImplicitSurface
        from neurecon_tpu.tools.extract_surface import main_function
        from neurecon_tpu.utils.mesh import read_ply

        surf = ImplicitSurface(W=64, D=3, skips=[], W_geo_feat=32,
                               embed_multires=4, radius_init=0.5)
        params = surf.init(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "ckpt.pt")
        with open(ckpt, "wb") as f:
            pickle.dump({"model": {"implicit_surface": jax.tree_util.tree_map(
                np.asarray, params)}}, f)

        out = str(tmp_path / "mesh.ply")
        args = SimpleNamespace(load_pt=ckpt, config=None, out=out, N=32,
                               volume_size=2.0, level=0.0, chunk=8192,
                               D=3, W=64, W_geo_feat=32, skip=-1, init_r=0.5,
                               embed_multires=4)
        main_function(args)
        verts, faces = read_ply(out)
        assert len(faces) > 100
        assert abs(np.median(np.linalg.norm(verts, axis=-1)) - 0.5) < 0.12


class TestMeshRasterAlignment:
    def test_raster_matches_analytic_pixel_convention(self):
        """A rasterized sphere mesh must land on the same pixels as the
        analytic renderer (get_rays lifts pixel (i,j) through image-plane
        point (i,j)): a half-pixel sampling offset shifts the silhouette
        centroid by ~0.5px, far above discretization noise."""
        from neurecon_tpu.dataio.synthetic import make_synthetic_scene
        from neurecon_tpu.tools.mesh_raster import rasterize_mesh
        from neurecon_tpu.utils.mesh import marching_tetrahedra
        H, W, r = 120, 160, 0.5
        scene = make_synthetic_scene(n_images=1, H=H, W=W, radius=r)
        gt_mask = scene["object_mask"][0].reshape(H, W)

        N = 96
        g = np.linspace(-0.8, 0.8, N)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        verts, faces = marching_tetrahedra(np.sqrt(X**2 + Y**2 + Z**2) - r)
        verts = verts / (N - 1) * 1.6 - 0.8
        _, _, mask = rasterize_mesh(verts, faces, scene["c2w"][0],
                                    scene["intrinsics"][0], H, W)

        inter = (mask & gt_mask).sum()
        union = (mask | gt_mask).sum()
        assert inter / union > 0.97
        yx_m = np.argwhere(mask).mean(0)
        yx_g = np.argwhere(gt_mask).mean(0)
        assert np.abs(yx_m - yx_g).max() < 0.25


class TestRenderViewSurfaceContent:
    def test_surface_render_video_is_not_black(self, tmp_path):
        """Regression: render_view's surface-render cast range was fixed at
        2R*1.2, which is SHORTER than the camera orbit radius — every
        surface-render video came out all-black while timings looked great.
        A geometric-init NeuS is already a radius-0.5 sphere, so the video
        must show it."""
        import os
        import pickle
        import imageio.v2 as imageio
        import jax
        from neurecon_tpu import config as config_lib
        from neurecon_tpu.models.frameworks import get_model
        from neurecon_tpu.tools.render_view import main_function

        import sys
        old = sys.argv
        sys.argv = ["x", "--config",
                    os.path.join(os.path.dirname(__file__), "..",
                                 "configs", "synthetic_smoke.yaml")]
        try:
            args, _ = config_lib.parse_cli()
        finally:
            sys.argv = old
        model, *_ = get_model(args)
        params = model.init(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "init.pt")
        with open(ckpt, "wb") as f:
            pickle.dump({"model": jax.tree_util.tree_map(np.asarray, params)}, f)

        args["load_pt"] = ckpt
        args["outdir"] = str(tmp_path)
        args["num_views"] = 3
        args["camera_path"] = "small_circle"
        args["camera_inds"] = "0,1,2"
        args["downscale"] = 4
        args["rayschunk"] = 4096
        args["use_surface_render"] = "sphere_tracing"

        # capture the cast range render_view passes to the caster: it must
        # cover camera -> far side of the object (the old fixed 2R*1.2 = 2.4
        # was SHORTER than the 3.0 camera orbit; a well-trained SDF then
        # marched past `far` in one step, masked out, and rendered black —
        # while an init-model render sneaks under the limit, so a content
        # check alone cannot catch the bug)
        import neurecon_tpu.models.ray_casting as rc
        captured = {}
        real = rc.make_surface_render_fn

        def spy(model_, **kw):
            captured.update(kw.get("ray_casting_cfgs") or {})
            return real(model_, **kw)

        rc.make_surface_render_fn = spy
        try:
            main_function(args)
        finally:
            rc.make_surface_render_fn = real
        assert captured["far"] >= 3.0 + 1.0, captured

        vids = [f for f in os.listdir(str(tmp_path))
                if f.startswith(args.expname + "_rgb_") and
                (f.endswith(".gif") or f.endswith(".mp4"))]
        assert vids, os.listdir(str(tmp_path))
        frames = imageio.mimread(str(tmp_path / vids[0]), memtest=False)
        arr = np.stack(frames)
        # the sphere fills a solid chunk of the frame and is lit
        assert arr.max() > 40, f"all-black surface render (max={arr.max()})"
        assert (arr.max(axis=-1) > 20).mean() > 0.01


class TestVisTools:
    """Content-verified figures from the camera/surface visualization tools
    and the real-checkpoint mode of test_volsdf_algo (VERDICT r2 item 8)."""

    def _synthetic_cfg(self, framework="NeuS", n_images=6):
        from neurecon_tpu.config import ConfigDict
        cfg = {
            "expname": "vis_test", "device_ids": -1,
            "data": {"type": "synthetic", "batch_size": 1, "data_dir": None,
                     "downscale": 1, "n_images": n_images, "H": 60, "W": 80,
                     "N_rays": 32, "val_rayschunk": 256, "val_downscale": 2},
            "model": {"framework": framework, "obj_bounding_radius": 1.0,
                      "variance_init": 0.05, "upsample_algo": "official_solution",
                      "N_upsample_iters": 1, "N_samples": 8, "N_importance": 8,
                      "surface": {"D": 2, "W": 32, "skips": [],
                                  "radius_init": 0.5, "embed_multires": 2},
                      "radiance": {"D": 1, "W": 32, "skips": [],
                                   "embed_multires": -1,
                                   "embed_multires_view": -1}},
            "training": {"with_mask": True, "w_mask": 1.0, "w_eikonal": 0.1,
                         "speed_factor": 10.0, "lr": 5e-4},
        }
        if framework == "VolSDF":
            cfg["data"]["scale_radius"] = 2.6
            cfg["data"]["near"] = 0.0
            cfg["data"]["far"] = 6.0
            cfg["model"].update({"obj_bounding_radius": 3.0,
                                 "outside_scene": "builtin",
                                 "max_upsample_iter": 2, "fine_sample_mul": 2,
                                 "W_geometry_feature": 32})
            cfg["model"]["surface"]["radius_init"] = 1.0
        return ConfigDict(cfg)

    def _png_has_content(self, path):
        import imageio.v2 as imageio
        img = imageio.imread(path)
        assert img.std() > 5, f"figure {path} is blank (std={img.std():.2f})"
        # a real figure has a substantial fraction of non-background pixels
        nonwhite = (np.asarray(img)[..., :3].min(-1) < 240).mean()
        assert nonwhite > 0.02, f"figure {path} nearly empty ({nonwhite:.3%})"

    def test_vis_camera_figure(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from neurecon_tpu.dataio import get_data
        from neurecon_tpu.tools.vis_camera import visualize

        cfg = self._synthetic_cfg()
        dataset = get_data(cfg)
        extr = np.linalg.inv(np.asarray(dataset.c2w_all))
        K = np.asarray(dataset.intrinsics_all[0])[:3, :3]
        out = str(tmp_path / "cams.png")
        fig = visualize(K, extr, frame_axes=True, show=False, save_path=out)
        # one glyph per camera: rect+tri+4 apex edges+3 axes = 9 lines each,
        # plus labels — count the drawn artists to catch an empty plot
        ax = fig.axes[0]
        assert len(ax.lines) >= 9 * len(extr)
        assert len(ax.texts) == len(extr)
        self._png_has_content(out)

    def test_vis_surface_and_cam_from_ckpt(self, tmp_path):
        import pickle
        import jax
        import matplotlib
        matplotlib.use("Agg")
        from neurecon_tpu.models.frameworks import get_model
        from neurecon_tpu.tools.vis_surface_and_cam import main_function

        cfg = self._synthetic_cfg()
        model, *_ = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "ckpt.pt")
        with open(ckpt, "wb") as f:
            pickle.dump({"model": jax.tree_util.tree_map(np.asarray, params)},
                        f)
        cfg["mesh_N"] = 32
        out = str(tmp_path / "surface_cams.png")
        fig = main_function(cfg, load_pt=ckpt, show=False, save_path=out)
        ax = fig.axes[0]
        assert len(ax.collections) >= 1   # the shaded mesh
        assert len(ax.texts) == 6         # per-camera labels
        self._png_has_content(out)

    def test_volsdf_algo_real_checkpoint(self, tmp_path):
        import pickle
        import jax
        from neurecon_tpu.config import save_config
        from neurecon_tpu.models.frameworks import get_model
        from neurecon_tpu.tools.test_volsdf_algo import main

        cfg = self._synthetic_cfg(framework="VolSDF")
        model, *_ = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "volsdf.pt")
        with open(ckpt, "wb") as f:
            pickle.dump({"model": jax.tree_util.tree_map(np.asarray, params)},
                        f)
        cfg_path = str(tmp_path / "volsdf.yaml")
        save_config(cfg, cfg_path)
        out = str(tmp_path / "volsdf_algo_real.png")
        main(save=out, load_pt=ckpt, config=cfg_path, N_init=64)
        self._png_has_content(out)


class TestMaskedPSNRDecomposition:
    def test_edge_band_dominates_when_interior_perfect(self):
        """The masked-PSNR inversion mechanism: a perfect interior + a soft
        silhouette ring must show ~all masked error in the edge band."""
        from neurecon_tpu.tools.eval_rgb import (erode_mask,
                                                 masked_psnr_decomposition,
                                                 psnr)

        H = W = 64
        yy, xx = np.mgrid[0:H, 0:W]
        r = np.sqrt((yy - 32) ** 2 + (xx - 32) ** 2)
        mask = r < 20
        gt = np.where(mask[..., None], 0.2, 1.0) * np.ones((H, W, 3))
        pred = gt.copy()
        ring = mask & ~erode_mask(mask, 2)
        pred[ring] = 0.6  # soft half-background silhouette pixels

        dec = masked_psnr_decomposition(pred.reshape(-1, 3), gt.reshape(-1, 3),
                                        mask.reshape(-1), H, W, edge_px=2)
        assert dec["edge_frac_of_masked_err"] > 0.999
        assert dec["psnr_interior"] > 100  # perfect interior
        assert dec["psnr_edge"] < 15
        # and the full-image PSNR exceeds the masked PSNR — the inversion —
        # purely because the denominator shrinks around the same ring error
        full = psnr(pred.reshape(-1, 3), gt.reshape(-1, 3))
        masked = psnr(pred.reshape(-1, 3), gt.reshape(-1, 3), mask.reshape(-1))
        assert full > masked

    def test_erode_mask_shrinks(self):
        from neurecon_tpu.tools.eval_rgb import erode_mask
        m = np.zeros((9, 9), bool)
        m[2:7, 2:7] = True
        e = erode_mask(m, 1)
        assert e.sum() == 9  # 5x5 -> 3x3
        assert erode_mask(m, 4).sum() == 0


class TestEvalStaged:
    def test_multiple_ckpts_one_process(self, tmp_path):
        import pickle
        import jax
        import jax.numpy as jnp
        from neurecon_tpu.models.frameworks import get_model
        from neurecon_tpu.tools.eval_staged import evaluate_ckpts
        from neurecon_tpu.utils.mesh import extract_mesh

        cfg = TestVisTools()._synthetic_cfg()
        model, *_ = get_model(cfg)
        ckpts = []
        for seed in (0, 1):
            params = model.init(jax.random.PRNGKey(seed))
            p = str(tmp_path / f"ck{seed}.pt")
            with open(p, "wb") as f:
                pickle.dump({"model": jax.tree_util.tree_map(np.asarray, params),
                             "global_step": 1000 * (seed + 1)}, f)
            ckpts.append(p)

        gt = str(tmp_path / "gt.ply")
        extract_mesh(lambda x: jnp.linalg.norm(x, axis=-1) - 0.5,
                     volume_size=1.5, N=48, filepath=gt)

        out = str(tmp_path / "staged.jsonl")
        rows = evaluate_ckpts(cfg, ckpts, gt_mesh=gt, n_eval=1,
                              rayschunk=1024, microchunk=256, mesh_N=32,
                              n_samples=2000, out_path=out)
        assert len(rows) == 2
        for r in rows:
            assert {"psnr", "psnr_min", "psnr_max", "psnr_masked",
                    "psnr_interior", "chamfer",
                    "accuracy", "completeness"} <= set(r)
            assert r["psnr_min"] <= r["psnr"] <= r["psnr_max"]
        assert rows[0]["step"] == 1000 and rows[1]["step"] == 2000
        import json as _json
        lines = [_json.loads(l) for l in open(out)]
        assert len(lines) == 2


class TestSupervise:
    def test_completion_passthrough(self):
        from neurecon_tpu.tools.supervise import supervise
        rc = supervise([sys.executable, "-c", "print('ok')"],
                       stall_sec=60, poll_sec=0.2, log=lambda *a: None)
        assert rc == 0

    def test_stall_kill_and_restart_resumes(self, tmp_path):
        """A child that stalls (no output) is killed and restarted; the
        restarted child 'resumes' (here: sees the state file) and finishes."""
        from neurecon_tpu.tools.supervise import supervise
        state = tmp_path / "state"
        script = (
            "import os, sys, time\n"
            f"p = {str(state)!r}\n"
            "if os.path.exists(p):\n"
            "    print('resumed'); sys.exit(0)\n"
            "open(p, 'w').write('x')\n"
            "print('first run', flush=True)\n"
            "time.sleep(600)\n"  # stall: no further output
        )
        t0 = time.time()
        # stall_sec must cover worst-case interpreter startup on a loaded
        # 1-core host (observed >3s under a concurrent TPU bench) or the
        # healthy first run is killed mid-startup and the test flakes
        rc = supervise([sys.executable, "-c", script], stall_sec=15,
                       max_restarts=3, poll_sec=0.2, log=lambda *a: None)
        assert rc == 0
        assert time.time() - t0 < 240
        assert state.exists()

    def test_crash_no_restart_flag(self):
        from neurecon_tpu.tools.supervise import supervise
        rc = supervise([sys.executable, "-c", "import sys; sys.exit(3)"],
                       stall_sec=60, poll_sec=0.2, restart_on_error=False,
                       log=lambda *a: None)
        assert rc == 3
