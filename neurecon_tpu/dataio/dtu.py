"""DTU / IDR-style dataset (reference dataio/DTU.py:9-160).

cameras.npz holds scale_mat_i / world_mat_i; P = world @ scale decomposes to
normalized intrinsics + c2w. All images preload to host numpy ([H*W, 3]
float32 in [0, 1]); masks to bool [H*W]. Optional global camera rescale to
scale_radius (max camera norm scaled to scale_radius / 1.1).
"""
from __future__ import annotations

import os

import numpy as np

from neurecon_tpu.utils.camera import load_K_Rt_from_P
from neurecon_tpu.utils.console import log
from neurecon_tpu.utils.io import glob_imgs, load_mask, load_rgb


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

        image_paths = sorted(glob_imgs(os.path.join(data_dir, "image")))
        mask_paths = sorted(glob_imgs(os.path.join(data_dir, "mask")))
        self.n_images = len(image_paths)

        tmp_rgb = load_rgb(image_paths[0], downscale)
        self.H, self.W = tmp_rgb.shape[:2]

        self.cam_file = os.path.join(data_dir, cam_file or "cameras.npz")
        camera_dict = np.load(self.cam_file)
        scale_mats = [camera_dict[f"scale_mat_{i}"].astype(np.float32)
                      for i in range(self.n_images)]
        world_mats = [camera_dict[f"world_mat_{i}"].astype(np.float32)
                      for i in range(self.n_images)]

        self.intrinsics_all, self.c2w_all = [], []
        cam_center_norms = []
        for scale_mat, world_mat in zip(scale_mats, world_mats):
            P = (world_mat @ scale_mat)[:3, :4]
            intrinsics, pose = load_K_Rt_from_P(P)
            cam_center_norms.append(np.linalg.norm(pose[:3, 3]))
            # downscale intrinsics (skew is a ratio: untouched)
            intrinsics[0, 2] /= downscale
            intrinsics[1, 2] /= downscale
            intrinsics[0, 0] /= downscale
            intrinsics[1, 1] /= downscale
            self.intrinsics_all.append(intrinsics.astype(np.float32))
            self.c2w_all.append(pose.astype(np.float32))

        if scale_radius > 0:
            max_cam_norm = max(cam_center_norms)
            scale = scale_radius / max_cam_norm / 1.1
            for c2w in self.c2w_all:
                c2w[:3, 3] *= scale

        self.rgb_images = []
        log.info(f"DTU: loading {self.n_images} images from {data_dir} ...")
        for path in image_paths:
            rgb = load_rgb(path, downscale)
            self.rgb_images.append(rgb.reshape(-1, 3))

        self.object_masks = []
        for path in mask_paths:
            self.object_masks.append(load_mask(path, downscale).reshape(-1))

        self.intrinsics_all = np.stack(self.intrinsics_all)
        self.c2w_all = np.stack(self.c2w_all)
        self.rgb_images = np.stack(self.rgb_images)
        if self.object_masks:
            self.object_masks = np.stack(self.object_masks)
        else:
            self.object_masks = None

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx):
        sample = {"intrinsics": self.intrinsics_all[idx]}
        if self.object_masks is not None:
            sample["object_mask"] = self.object_masks[idx]
        if not self.train_cameras:
            sample["c2w"] = self.c2w_all[idx]
        ground_truth = {"rgb": self.rgb_images[idx]}
        return idx, sample, ground_truth

    def get_scale_mat(self):
        return np.load(self.cam_file)["scale_mat_0"]

    def get_gt_pose(self, scaled: bool = True):
        camera_dict = np.load(self.cam_file)
        c2w_all = []
        for i in range(self.n_images):
            P = camera_dict[f"world_mat_{i}"].astype(np.float32)
            if scaled:
                P = P @ camera_dict[f"scale_mat_{i}"].astype(np.float32)
            _, pose = load_K_Rt_from_P(P[:3, :4])
            c2w_all.append(pose)
        return np.stack(c2w_all)

    def get_pose_init(self):
        """Noisy pose initializations from the linear method, as [N, 7] rows
        of (quat wxyz, translation) — camera-pose-optimization starting point
        (ref dataio/DTU.py:126-160)."""
        from neurecon_tpu.utils.camera import rot_to_quat
        cam_file = os.path.join(self.instance_dir, "cameras_linear_init.npz")
        camera_dict = np.load(cam_file)
        init_pose = []
        for i in range(self.n_images):
            P = (camera_dict[f"world_mat_{i}"].astype(np.float32)
                 @ camera_dict[f"scale_mat_{i}"].astype(np.float32))[:3, :4]
            _, pose = load_K_Rt_from_P(P)
            init_pose.append(pose)
        init_pose = np.stack(init_pose)
        init_quat = rot_to_quat(init_pose[:, :3, :3])
        return np.concatenate([init_quat, init_pose[:, :3, 3]], axis=1).astype(
            np.float32)
