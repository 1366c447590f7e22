"""Fixture tests for the data layer: synthesized DTU / BlendedMVS / custom
scenes written to tmp dirs, parsed back through the real loaders, with known
ground-truth cameras (ref dataio/DTU.py:42-160, BlendedMVS.py:112-151,
custom.py:12-148) — plus a few end-to-end train steps through each loader."""
import json
import os

import numpy as np
import pytest

from neurecon_tpu.utils.camera import look_at, quat_to_rot

H, W = 120, 160
N_VIEWS = 3


def _gt_cameras(n=N_VIEWS):
    """Known intrinsics (with skew) + c2w poses on a circle looking at origin."""
    K = np.array([[500.0, 2.0, 80.0],
                  [0.0, 480.0, 60.0],
                  [0.0, 0.0, 1.0]])
    c2ws = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        cam = np.array([4.0 * np.cos(ang), 1.0, 4.0 * np.sin(ang)])
        c2ws.append(look_at(cam, np.zeros(3)))
    return K, np.stack(c2ws)


def _projections(K, c2ws):
    """P_34 = K @ w2c[:3, :4] for each view."""
    Ps = []
    for c2w in c2ws:
        w2c = np.linalg.inv(c2w)
        Ps.append(K @ w2c[:3, :4])
    return np.stack(Ps)


def _write_images(img_dir, n=N_VIEWS, ext="png"):
    import imageio.v2 as imageio
    os.makedirs(img_dir, exist_ok=True)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    imgs = []
    for i in range(n):
        # smooth gradients (JPEG-friendly), distinct per view
        img = np.stack([(xx / W + i * 0.1) % 1.0,
                        (yy / H) * 0.8,
                        ((xx + yy) / (H + W) + i * 0.2) % 1.0], -1)
        img = (img * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(img_dir, f"{i:06d}.{ext}"), img)
        imgs.append(img)
    return np.stack(imgs)


def _write_masks(mask_dir, n=N_VIEWS):
    import imageio.v2 as imageio
    os.makedirs(mask_dir, exist_ok=True)
    yy, xx = np.mgrid[:H, :W]
    disc = ((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2
    for i in range(n):
        imageio.imwrite(os.path.join(mask_dir, f"{i:06d}.png"),
                        (disc * 255).astype(np.uint8))
    return disc


def _P44(P34):
    P = np.eye(4)
    P[:3, :4] = P34
    return P


# ---------------------------------------------------------------------------
# DTU (IDR cameras.npz format)
# ---------------------------------------------------------------------------

@pytest.fixture()
def dtu_scene(tmp_path):
    """world_mat_i = P44 @ inv(scale_mat): the loader recomposes
    P = (world @ scale)[:3,:4] and must recover our known K and c2w."""
    K, c2ws = _gt_cameras()
    Ps = _projections(K, c2ws)
    S = np.diag([2.0, 2.0, 2.0, 1.0])
    S[:3, 3] = [0.1, -0.2, 0.3]

    root = tmp_path / "dtu_scan"
    root.mkdir()
    npz = {}
    for i, P34 in enumerate(Ps):
        npz[f"world_mat_{i}"] = _P44(P34) @ np.linalg.inv(S)
        npz[f"scale_mat_{i}"] = S
    np.savez(root / "cameras.npz", **npz)
    # noisy-pose init file: same projections (zero noise keeps GT checkable)
    np.savez(root / "cameras_linear_init.npz", **npz)
    imgs = _write_images(root / "image")
    disc = _write_masks(root / "mask")
    return {"root": str(root), "K": K, "c2ws": c2ws, "imgs": imgs, "disc": disc}


class TestDTU:
    def test_cameras_roundtrip(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"])
        assert len(ds) == N_VIEWS and (ds.H, ds.W) == (H, W)
        K = dtu_scene["K"]
        for i in range(N_VIEWS):
            idx, sample, gt = ds[i]
            np.testing.assert_allclose(sample["intrinsics"][:3, :3], K,
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(sample["c2w"], dtu_scene["c2ws"][i],
                                       rtol=1e-4, atol=1e-4)
            # pixels round-trip within quantization
            got = gt["rgb"].reshape(H, W, 3)
            want = dtu_scene["imgs"][i].astype(np.float32) / 255.0
            assert np.abs(got - want).max() < 1.5 / 255.0
            # mask: the white disc
            assert (sample["object_mask"].reshape(H, W) ==
                    dtu_scene["disc"]).all()

    def test_downscale(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"], downscale=2)
        assert (ds.H, ds.W) == (H // 2, W // 2)
        K = dtu_scene["K"]
        intr = ds.intrinsics_all[0]
        np.testing.assert_allclose(
            [intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]],
            [K[0, 0] / 2, K[1, 1] / 2, K[0, 2] / 2, K[1, 2] / 2],
            rtol=1e-4, atol=1e-3)

    def test_scale_radius(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"], scale_radius=3.0)
        norms = np.linalg.norm(ds.c2w_all[:, :3, 3], axis=-1)
        assert abs(norms.max() - 3.0 / 1.1) < 1e-4

    def test_get_gt_pose_and_scale_mat(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"])
        S = np.diag([2.0, 2.0, 2.0, 1.0])
        S[:3, 3] = [0.1, -0.2, 0.3]
        np.testing.assert_allclose(ds.get_scale_mat(), S)
        gt_scaled = ds.get_gt_pose(scaled=True)
        np.testing.assert_allclose(gt_scaled, dtu_scene["c2ws"], rtol=1e-4,
                                   atol=1e-4)
        # unscaled pose differs (scale_mat is not identity)
        gt_raw = ds.get_gt_pose(scaled=False)
        assert np.abs(gt_raw - gt_scaled).max() > 1e-2

    def test_get_pose_init(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"])
        qt = ds.get_pose_init()
        assert qt.shape == (N_VIEWS, 7)
        for i in range(N_VIEWS):
            R = quat_to_rot(qt[i, :4])
            np.testing.assert_allclose(R, dtu_scene["c2ws"][i][:3, :3],
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(qt[i, 4:], dtu_scene["c2ws"][i][:3, 3],
                                       rtol=1e-3, atol=1e-3)

    def test_train_cameras_flag(self, dtu_scene):
        from neurecon_tpu.dataio.dtu import SceneDataset
        ds = SceneDataset(dtu_scene["root"], train_cameras=True)
        _, sample, _ = ds[0]
        assert "c2w" not in sample  # poses come from the optimizer instead


# ---------------------------------------------------------------------------
# BlendedMVS (MVSNet cam.txt format)
# ---------------------------------------------------------------------------

@pytest.fixture()
def bmvs_scene(tmp_path):
    from neurecon_tpu.dataio.blendedmvs import write_cam
    K, c2ws = _gt_cameras()
    K44 = np.eye(4)
    K44[:3, :3] = K

    root = tmp_path / "bmvs_scan"
    (root / "cams_normalized").mkdir(parents=True)
    imgs = _write_images(root / "blended_images", ext="jpg")
    for i, c2w in enumerate(c2ws):
        cam = np.stack([np.linalg.inv(c2w), K44])
        write_cam(str(root / "cams_normalized" / f"{i:06d}_cam.txt"), cam)
    return {"root": str(root), "K": K, "c2ws": c2ws, "imgs": imgs}


class TestBlendedMVS:
    def test_cam_txt_roundtrip(self, tmp_path):
        from neurecon_tpu.dataio.blendedmvs import load_cam, write_cam
        rng = np.random.RandomState(3)
        cam = np.stack([np.eye(4) + 0.01 * rng.randn(4, 4), np.eye(4)])
        cam[1, :3, :3] = np.array([[400.0, 1.0, 50], [0, 410, 40], [0, 0, 1]])
        cam[1, 3] = [0.1, 0.002, 128, 0.356]  # depth-range row
        path = str(tmp_path / "x_cam.txt")
        write_cam(path, cam)
        back = load_cam(path, original_blendedmvs=True)
        np.testing.assert_allclose(back, cam, rtol=1e-6, atol=1e-9)

    def test_scene(self, bmvs_scene):
        from neurecon_tpu.dataio.blendedmvs import SceneDataset
        ds = SceneDataset(bmvs_scene["root"])
        assert len(ds) == N_VIEWS and (ds.H, ds.W) == (H, W)
        assert ds.object_masks is None
        for i in range(N_VIEWS):
            _, sample, gt = ds[i]
            np.testing.assert_allclose(sample["intrinsics"][:3, :3],
                                       bmvs_scene["K"], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(sample["c2w"], bmvs_scene["c2ws"][i],
                                       rtol=1e-4, atol=1e-5)
            got = gt["rgb"].reshape(H, W, 3)
            want = bmvs_scene["imgs"][i].astype(np.float32) / 255.0
            # JPEG is lossy: loose bound, right image content
            assert np.abs(got - want).mean() < 0.08

    def test_scale_radius(self, bmvs_scene):
        from neurecon_tpu.dataio.blendedmvs import SceneDataset
        ds = SceneDataset(bmvs_scene["root"], scale_radius=2.0)
        norms = np.linalg.norm(ds.c2w_all[:, :3, 3], axis=-1)
        assert abs(norms.max() - 2.0 / 1.1) < 1e-4


# ---------------------------------------------------------------------------
# custom (cam.json format)
# ---------------------------------------------------------------------------

@pytest.fixture()
def custom_scene(tmp_path):
    K, c2ws = _gt_cameras()
    Ps = _projections(K, c2ws)
    S = np.diag([1.5, 1.5, 1.5, 1.0])
    S[:3, 3] = [-0.3, 0.0, 0.2]

    root = tmp_path / "custom_scan"
    root.mkdir()
    imgs = _write_images(root / "images")
    disc = _write_masks(root / "mask")
    _write_masks(root / "mask_out")
    cam = {}
    for i, P34 in enumerate(Ps):
        world = _P44(P34) @ np.linalg.inv(S)
        cam[f"{i:06d}.png"] = {"P": world.reshape(-1).tolist(),
                               "SCALE": S.reshape(-1).tolist()}
    with open(root / "cam.json", "w") as f:
        json.dump(cam, f)
    return {"root": str(root), "K": K, "c2ws": c2ws, "imgs": imgs, "disc": disc}


class TestCustom:
    def test_scene(self, custom_scene):
        from neurecon_tpu.dataio.custom import SceneDataset
        ds = SceneDataset(custom_scene["root"])
        assert len(ds) == N_VIEWS
        for i in range(N_VIEWS):
            _, sample, gt = ds[i]
            np.testing.assert_allclose(sample["intrinsics"][:3, :3],
                                       custom_scene["K"], rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(sample["c2w"], custom_scene["c2ws"][i],
                                       rtol=1e-4, atol=1e-4)
            assert (sample["object_mask"].reshape(H, W) ==
                    custom_scene["disc"]).all()
            assert "mask_ignore" in sample
            got = gt["rgb"].reshape(H, W, 3)
            want = custom_scene["imgs"][i].astype(np.float32) / 255.0
            assert np.abs(got - want).max() < 1.5 / 255.0

    def test_no_masks(self, custom_scene, tmp_path):
        import shutil
        root2 = tmp_path / "nomask"
        shutil.copytree(custom_scene["root"], root2)
        shutil.rmtree(root2 / "mask")
        shutil.rmtree(root2 / "mask_out")
        from neurecon_tpu.dataio.custom import SceneDataset
        ds = SceneDataset(str(root2))
        _, sample, _ = ds[0]
        assert "object_mask" not in sample and "mask_ignore" not in sample


# ---------------------------------------------------------------------------
# end-to-end: a few train steps through each loader
# ---------------------------------------------------------------------------

def _tiny_train_args(tmp_path, data_type, data_dir, with_mask):
    from neurecon_tpu.config import load_yaml
    args = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "synthetic_smoke.yaml"))
    args.data["type"] = data_type
    args.data["data_dir"] = data_dir
    args.data["N_rays"] = 32
    args.data["val_downscale"] = 4
    args.training["exp_dir"] = str(tmp_path / f"exp_{data_type}")
    args.training["num_iters"] = 3
    args.training["i_val"] = 10000
    args.training["i_log"] = 1
    args.training["with_mask"] = with_mask
    if not with_mask:
        args.model["N_outside"] = 8
    args.model["N_samples"] = 8
    args.model["N_importance"] = 8
    args.model["N_upsample_iters"] = 1
    for net in (args.model.surface, args.model.radiance):
        net["W"] = 32
        net["D"] = 2
        net["skips"] = []
    args.model["W_geometry_feature"] = 32
    return args


class TestEndToEnd:
    def test_train_through_dtu(self, dtu_scene, tmp_path):
        from neurecon_tpu.train import main_function
        args = _tiny_train_args(tmp_path, "DTU", dtu_scene["root"], True)
        main_function(args)
        assert os.path.exists(os.path.join(args.training.exp_dir, "ckpts"))

    def test_train_through_blendedmvs(self, bmvs_scene, tmp_path):
        from neurecon_tpu.train import main_function
        args = _tiny_train_args(tmp_path, "BlendedMVS", bmvs_scene["root"],
                                False)
        main_function(args)
        assert os.path.exists(os.path.join(args.training.exp_dir, "ckpts"))

    def test_train_through_custom(self, custom_scene, tmp_path):
        from neurecon_tpu.train import main_function
        args = _tiny_train_args(tmp_path, "custom", custom_scene["root"], True)
        main_function(args)
        assert os.path.exists(os.path.join(args.training.exp_dir, "ckpts"))


class TestSyntheticTorus:
    """The torus scene: exact SDF oracle for mask/depth and the GT mesher."""

    def test_hits_on_level_set(self):
        from neurecon_tpu.dataio.synthetic import (make_synthetic_scene,
                                                   torus_sdf)
        s = make_synthetic_scene(n_images=2, H=60, W=80, shape="torus")
        K, c2w = s["intrinsics"][0], s["c2w"][0]
        jj, ii = np.meshgrid(np.arange(60.0), np.arange(80.0), indexing="ij")
        dirs = np.stack([(ii - K[0, 2]) / K[0, 0], (jj - K[1, 2]) / K[1, 1],
                         np.ones_like(ii)], -1).reshape(-1, 3) @ c2w[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        mask = s["object_mask"][0]
        assert 0.02 < mask.mean() < 0.5
        pts = c2w[:3, 3] + s["depth"][0][..., None] * dirs
        assert np.abs(torus_sdf(pts[mask], 0.32, 0.16)).max() < 1e-4
        # torus has a hole: some central pixels of some view must miss
        assert not mask.all()

    def test_normals_shade_consistently(self):
        from neurecon_tpu.dataio.synthetic import torus_normal, torus_sdf
        rng = np.random.RandomState(0)
        p = rng.uniform(-0.6, 0.6, (2048, 3))
        n = torus_normal(p)
        eps = 1e-5
        for ax in range(3):
            dp = np.zeros(3)
            dp[ax] = eps
            fd = (torus_sdf(p + dp) - torus_sdf(p - dp)) / (2 * eps)
            assert np.abs(fd - n[..., ax]).max() < 1e-3

    def test_gt_mesh_tool(self, tmp_path):
        import subprocess
        import sys
        out = str(tmp_path / "gt_torus.ply")
        subprocess.run([sys.executable, "-m", "neurecon_tpu.tools.make_gt_mesh",
                        "--shape", "torus", "--N", "64", "--out", out],
                       check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        from neurecon_tpu.dataio.synthetic import torus_sdf
        from neurecon_tpu.utils.mesh import read_ply
        v, f = read_ply(out)
        assert len(v) > 500 and len(f) > 500
        # verts on the level set to within a grid cell (1.5 / 63)
        assert np.abs(torus_sdf(v, 0.32, 0.16)).max() < 1.5 / 63

    def test_dataset_dispatch_shape(self):
        from neurecon_tpu.config import ConfigDict
        from neurecon_tpu.dataio import get_data
        args = ConfigDict(data=ConfigDict(
            type="synthetic", shape="torus", downscale=1, n_images=2,
            H=40, W=52))
        ds = get_data(args)
        assert ds.shape == "torus" and len(ds) == 2
        idx, mi, gt = ds[0]
        assert gt["rgb"].shape == (40 * 52, 3)


class TestSyntheticComposite:
    """The composite scene (torus + balls + rounded box, hard-min union):
    the hardest analytic oracle — concavities, union creases, occlusion."""

    def test_sdf_exact_outside(self):
        # hard-min union of exact SDFs is exact where the nearest primitive
        # dominates: a far probe point's value equals its distance to the
        # closest primitive surface (here the big ball, to 1e-12)
        from neurecon_tpu.dataio.synthetic import (composite_params,
                                                   composite_sdf)
        prm = composite_params(0.5)
        p = np.array([[0.0, 2.0, 0.0]])
        c = np.asarray(prm["ball_a"]["c"])
        expect = np.linalg.norm(p - c, axis=-1) - prm["ball_a"]["r"]
        np.testing.assert_allclose(composite_sdf(p, 0.5), expect, atol=1e-12)

    def test_numpy_jax_agree(self):
        import jax.numpy as jnp
        from neurecon_tpu.dataio.synthetic import composite_sdf
        rng = np.random.RandomState(0)
        p = rng.uniform(-1.0, 1.0, (4096, 3))
        d_np = composite_sdf(p, 0.5)
        d_jx = np.asarray(composite_sdf(jnp.asarray(p), 0.5, xp=jnp))
        np.testing.assert_allclose(d_np, d_jx, atol=1e-5)

    def test_hits_on_level_set(self):
        from neurecon_tpu.dataio.synthetic import (composite_sdf,
                                                   make_synthetic_scene)
        s = make_synthetic_scene(n_images=3, H=60, W=80, shape="composite")
        K, c2w = s["intrinsics"][0], s["c2w"][0]
        jj, ii = np.meshgrid(np.arange(60.0), np.arange(80.0), indexing="ij")
        dirs = np.stack([(ii - K[0, 2]) / K[0, 0], (jj - K[1, 2]) / K[1, 1],
                         np.ones_like(ii)], -1).reshape(-1, 3) @ c2w[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        mask = s["object_mask"][0]
        assert 0.05 < mask.mean() < 0.6
        pts = c2w[:3, 3] + s["depth"][0][..., None] * dirs
        assert np.abs(composite_sdf(pts[mask], 0.5)).max() < 1e-4
        # every view sees the object, none is fully covered
        for m in s["object_mask"]:
            assert 0.0 < m.mean() < 1.0

    def test_normals_match_fd_of_sdf(self):
        from neurecon_tpu.dataio.synthetic import (composite_normal,
                                                   composite_sdf)
        rng = np.random.RandomState(1)
        p = rng.uniform(-0.9, 0.9, (2048, 3))
        # keep away from crease lines where the gradient is discontinuous
        keep = np.abs(composite_sdf(p, 0.5)) > 0.02
        n = composite_normal(p[keep], 0.5)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
        # moving along the normal increases the SDF by ~eps (unit gradient)
        eps = 1e-4
        moved = composite_sdf(p[keep] + eps * n, 0.5) - composite_sdf(p[keep], 0.5)
        assert np.abs(moved - eps).max() < 2e-5

    def test_gt_mesh_tool(self, tmp_path):
        import subprocess
        import sys
        out = str(tmp_path / "gt_composite.ply")
        subprocess.run([sys.executable, "-m", "neurecon_tpu.tools.make_gt_mesh",
                        "--shape", "composite", "--N", "64", "--out", out],
                       check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        from neurecon_tpu.dataio.synthetic import composite_sdf
        from neurecon_tpu.utils.mesh import read_ply
        v, f = read_ply(out)
        assert len(v) > 1000 and len(f) > 1000
        assert np.abs(composite_sdf(v, 0.5)).max() < 1.5 / 63

    def test_dataset_dispatch_shape(self):
        from neurecon_tpu.config import ConfigDict
        from neurecon_tpu.dataio import get_data
        args = ConfigDict(data=ConfigDict(
            type="synthetic", shape="composite", downscale=1, n_images=2,
            H=40, W=52))
        ds = get_data(args)
        assert ds.shape == "composite" and len(ds) == 2
        idx, mi, gt = ds[0]
        assert gt["rgb"].shape == (40 * 52, 3)


class TestSyntheticEnvmap:
    def test_envmap_background(self):
        from neurecon_tpu.dataio.synthetic import (envmap_color,
                                                   make_synthetic_scene)
        s = make_synthetic_scene(n_images=2, H=40, W=52, background="envmap")
        rgb = s["rgb"][0]
        mask = s["object_mask"][0]
        # background pixels carry the env color (non-black, smooth)
        assert rgb[~mask].min() > 0.0
        assert 0.2 < rgb[~mask].mean() < 0.8
        # object pixels unchanged vs the black-background scene
        s0 = make_synthetic_scene(n_images=2, H=40, W=52, background="black")
        np.testing.assert_array_equal(rgb[mask], s0["rgb"][0][mask])
        assert (s0["rgb"][0][~mask] == 0).all()
        # env color is a pure function of direction with unit-norm invariance
        d = np.array([[0.3, -0.8, 0.52]])
        np.testing.assert_allclose(envmap_color(d), envmap_color(3.7 * d),
                                   atol=1e-12)
