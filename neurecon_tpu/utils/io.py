"""Image / video IO and misc file helpers (reference utils/io_util.py:19-186).

Images are float32 in [0, 1], HWC layout (the CHW transpose of the reference
is a torch-ism the loaders undo anyway).
"""
from __future__ import annotations

import glob
import os
import shutil
from typing import List

import numpy as np


def glob_imgs(path: str) -> List[str]:
    imgs = []
    for ext in ["*.png", "*.jpg", "*.JPEG", "*.JPG"]:
        imgs.extend(glob.glob(os.path.join(path, ext)))
    return imgs


def _rescale(img: np.ndarray, downscale: float) -> np.ndarray:
    import cv2
    H, W = img.shape[:2]
    return cv2.resize(img, (int(W / downscale), int(H / downscale)),
                      interpolation=cv2.INTER_AREA)


def load_rgb(path: str, downscale: float = 1) -> np.ndarray:
    """-> float32 [H, W, 3] in [0, 1]."""
    import imageio.v2 as imageio
    img = imageio.imread(path)
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    img = img[..., :3]
    if downscale != 1:
        img = _rescale(img, downscale)
    return img


def load_mask(path: str, downscale: float = 1) -> np.ndarray:
    """-> bool [H, W]; >50% brightness = object."""
    import imageio.v2 as imageio
    alpha = np.asarray(imageio.imread(path))
    if alpha.ndim == 3:
        alpha = alpha[..., :3].mean(-1)
    alpha = alpha.astype(np.float32)
    if alpha.max() <= 1.0:
        alpha = alpha * 255.0
    if downscale != 1:
        alpha = _rescale(alpha, downscale)
    return alpha > 127.5


def cond_mkdir(path: str):
    os.makedirs(path, exist_ok=True)


def backup(backup_dir: str, source_root: str = None):
    """Snapshot all framework .py sources into exp_dir/backup
    (ref io_util.py:72-110)."""
    if source_root is None:
        source_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cond_mkdir(backup_dir)
    for dirpath, dirnames, filenames in os.walk(source_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        rel = os.path.relpath(dirpath, source_root)
        for fname in filenames:
            if fname.endswith(".py"):
                dst_dir = os.path.join(backup_dir, rel)
                cond_mkdir(dst_dir)
                shutil.copyfile(os.path.join(dirpath, fname),
                                os.path.join(dst_dir, fname))


def gallery(array: np.ndarray, ncols: int = 3) -> np.ndarray:
    """[B, H, W, C] -> tiled [gh*H, gw*W, C]."""
    nindex, height, width, intensity = array.shape
    ncols = max(1, min(ncols, nindex))
    nrows = int(np.ceil(nindex / ncols))
    pad = nrows * ncols - nindex
    if pad:
        array = np.concatenate(
            [array, np.zeros((pad, height, width, intensity), array.dtype)], 0)
    return (array.reshape(nrows, ncols, height, width, intensity)
            .swapaxes(1, 2)
            .reshape(height * nrows, width * ncols, intensity))


def save_video(imgs: np.ndarray, fname: str, as_gif: bool = False, fps: int = 24,
               quality: int = 8, already_np: bool = True, gif_scale: int = 512):
    """imgs: [N, H, W, 3] float [0,1] or uint8 -> mp4 (+ optional gif).

    When no ffmpeg backend is available (this image has none), falls back to
    an animated GIF (PIL-based, always available) at the same basename.
    """
    import imageio.v2 as imageio
    imgs = np.asarray(imgs)
    if imgs.dtype != np.uint8:
        imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    try:
        imageio.mimwrite(fname, imgs, fps=fps, quality=quality)
    except Exception:
        gif_path = os.path.splitext(fname)[0] + ".gif"
        imageio.mimwrite(gif_path, imgs, duration=1000.0 / fps, loop=0)
        from neurecon_tpu.utils.console import log
        log.warning(f"no mp4 backend; wrote {gif_path} instead")
        fname = gif_path
    if as_gif and not fname.endswith(".gif"):
        gif_path = os.path.splitext(fname)[0] + ".gif"
        imageio.mimwrite(gif_path, imgs, duration=1000.0 / fps, loop=0)
    return fname


def enable_fused_kernels():
    """--fused_kernels: opt all eval-path Pallas megakernels in (upsampler,
    fine-sample, nablas). Eval tools only — the nablas kernel has no VJP and
    must never be on during training."""
    import os
    for k in ("NEURECON_FUSED_UPSAMPLE", "NEURECON_FUSED_FINESAMPLE",
              "NEURECON_FUSED_NABLAS"):
        os.environ[k] = "1"
