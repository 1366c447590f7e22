"""Custom dataset (reference dataio/custom.py:12-148): cam.json with per-image
P (+ optional SCALE) matrices; optional mask/ and mask_out/ (ignore) dirs."""
from __future__ import annotations

import json
import os

import numpy as np

from neurecon_tpu.utils.camera import load_K_Rt_from_P
from neurecon_tpu.utils.console import log
from neurecon_tpu.utils.io import load_mask, load_rgb


class SceneDataset:
    def __init__(self,
                 data_dir: str,
                 downscale: float = 1.0,
                 cam_file: str = None,
                 scale_radius: float = -1,
                 train_cameras: bool = False):
        assert os.path.exists(data_dir), f"Data directory is empty: {data_dir}"
        self.instance_dir = data_dir
        self.train_cameras = train_cameras
        self.downscale = downscale

        image_dir = os.path.join(data_dir, "images")
        mask_dir = os.path.join(data_dir, "mask")
        mask_ignore_dir = os.path.join(data_dir, "mask_out")
        self.has_mask = os.path.exists(mask_dir) and len(os.listdir(mask_dir)) > 0
        self.has_mask_out = (os.path.exists(mask_ignore_dir)
                             and len(os.listdir(mask_ignore_dir)) > 0)

        self.cam_file = os.path.join(data_dir, cam_file or "cam.json")
        camera_dict = json.load(open(self.cam_file))
        self.n_images = len(camera_dict)

        cam_center_norms = []
        self.intrinsics_all, self.c2w_all = [], []
        self.rgb_images, self.object_masks, self.masks_ignore = [], [], []
        log.info(f"custom: loading {self.n_images} images from {data_dir} ...")
        for imgname, v in camera_dict.items():
            world_mat = np.array(v["P"], dtype=np.float32).reshape(4, 4)
            if "SCALE" in v:
                P = world_mat @ np.array(v["SCALE"], dtype=np.float32).reshape(4, 4)
            else:
                P = world_mat
            intrinsics, c2w = load_K_Rt_from_P(P[:3, :4])
            cam_center_norms.append(np.linalg.norm(c2w[:3, 3]))
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics.astype(np.float32))
            self.c2w_all.append(c2w.astype(np.float32))

            rgb = load_rgb(os.path.join(image_dir, imgname), downscale)
            self.H, self.W = rgb.shape[:2]
            self.rgb_images.append(rgb.reshape(-1, 3))

            fname_base = os.path.splitext(imgname)[0]
            if self.has_mask:
                self.object_masks.append(load_mask(
                    os.path.join(mask_dir, f"{fname_base}.png"),
                    downscale).reshape(-1))
            if self.has_mask_out:
                self.masks_ignore.append(load_mask(
                    os.path.join(mask_ignore_dir, f"{fname_base}.png"),
                    downscale).reshape(-1))

        if scale_radius > 0:
            max_cam_norm = max(cam_center_norms)
            for c2w in self.c2w_all:
                c2w[:3, 3] *= scale_radius / max_cam_norm / 1.1

        self.intrinsics_all = np.stack(self.intrinsics_all)
        self.c2w_all = np.stack(self.c2w_all)
        self.rgb_images = np.stack(self.rgb_images)
        self.object_masks = np.stack(self.object_masks) if self.has_mask else None
        self.masks_ignore = np.stack(self.masks_ignore) if self.has_mask_out else None

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {"intrinsics": self.intrinsics_all[idx]}
        if self.has_mask:
            sample["object_mask"] = self.object_masks[idx]
        if self.has_mask_out:
            sample["mask_ignore"] = self.masks_ignore[idx]
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        return idx, sample, {"rgb": self.rgb_images[idx]}

    def get_gt_pose(self, scaled: bool = True):
        camera_dict = json.load(open(self.cam_file))
        c2w_all = []
        for imgname, v in camera_dict.items():
            P = np.array(v["P"], dtype=np.float32).reshape(4, 4)
            if scaled and "SCALE" in v:
                P = P @ np.array(v["SCALE"], dtype=np.float32).reshape(4, 4)
            _, c2w = load_K_Rt_from_P(P[:3, :4])
            c2w_all.append(c2w)
        return np.stack(c2w_all)
