"""BlendedMVS dataset (reference dataio/BlendedMVS.py:10-172): MVSNet-style
{name}_cam.txt extrinsics/intrinsics from the cams_normalized directory; no
object masks; optional global camera rescale."""
from __future__ import annotations

import os

import numpy as np

from neurecon_tpu.utils.console import log
from neurecon_tpu.utils.io import glob_imgs, load_rgb


def load_cam(filepath: str, interval_scale: float = 1,
             original_blendedmvs: bool = False) -> np.ndarray:
    """MVSNet camera txt -> [2, 4, 4]: [0]=extrinsic (w2c), [1]=intrinsic."""
    cam = np.repeat(np.eye(4)[None, ...], repeats=2, axis=0)
    words = open(filepath).read().split()
    for i in range(4):
        for j in range(4):
            cam[0][i][j] = words[4 * i + j + 1]
    for i in range(3):
        for j in range(3):
            cam[1][i][j] = words[3 * i + j + 18]
    if original_blendedmvs:
        # depth range row (d_min, d_interval, d_num, d_max)
        if len(words) >= 29:
            cam[1][3][0] = words[27]
            cam[1][3][1] = float(words[28]) * interval_scale
            cam[1][3][2] = words[29] if len(words) >= 30 else 128
            cam[1][3][3] = (words[30] if len(words) >= 31 else
                            cam[1][3][0] + cam[1][3][1] * float(cam[1][3][2]))
    return cam


def write_cam(filepath: str, cam: np.ndarray):
    with open(filepath, "w") as f:
        f.write("extrinsic\n")
        for i in range(4):
            f.write(" ".join(str(cam[0][i][j]) for j in range(4)) + " \n")
        f.write("\nintrinsic\n")
        for i in range(3):
            f.write(" ".join(str(cam[1][i][j]) for j in range(3)) + " \n")
        f.write("\n" + " ".join(str(cam[1][3][j]) for j in range(4)) + "\n")


class SceneDataset:
    def __init__(self,
                 data_dir: str,
                 downscale: float = 1.0,
                 scale_radius: float = -1,
                 train_cameras: bool = False):
        assert os.path.exists(data_dir), f"Data directory is empty: {data_dir}"
        self.instance_dir = data_dir
        self.train_cameras = train_cameras
        self.downscale = downscale

        image_dir = os.path.join(data_dir, "blended_images")
        cam_dir = os.path.join(data_dir, "cams_normalized")

        self.intrinsics_all, self.c2w_all, self.rgb_images = [], [], []
        self.basenames = []
        cam_center_norms = []
        log.info(f"BlendedMVS: loading from {data_dir} ...")
        for imgpath in sorted(glob_imgs(image_dir)):
            if "masked" in imgpath:
                continue
            basename = os.path.splitext(os.path.split(imgpath)[-1])[0]
            self.basenames.append(basename)

            cam = load_cam(os.path.join(cam_dir, f"{basename}_cam.txt"))
            extrinsics, intrinsics = cam[0], cam[1]
            c2w = np.linalg.inv(extrinsics).astype(np.float32)
            cam_center_norms.append(np.linalg.norm(c2w[:3, 3]))
            intrinsics = intrinsics.astype(np.float32)
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics)
            self.c2w_all.append(c2w)

            rgb = load_rgb(imgpath, downscale)
            self.H, self.W = rgb.shape[:2]
            self.rgb_images.append(rgb.reshape(-1, 3))

        if scale_radius > 0:
            max_cam_norm = max(cam_center_norms)
            for c2w in self.c2w_all:
                c2w[:3, 3] *= scale_radius / max_cam_norm / 1.1

        self.intrinsics_all = np.stack(self.intrinsics_all)
        self.c2w_all = np.stack(self.c2w_all)
        self.rgb_images = np.stack(self.rgb_images)
        self.object_masks = None
        self.n_images = len(self.rgb_images)

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {"intrinsics": self.intrinsics_all[idx]}
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        return idx, sample, {"rgb": self.rgb_images[idx]}

    def get_gt_pose(self):
        return self.c2w_all
