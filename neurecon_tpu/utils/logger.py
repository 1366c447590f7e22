"""Experiment logger: TensorBoard scalars/images + pickled stats dict.

Mirrors the reference Logger (utils/logger.py:17-159): `add` scalars into an
in-memory stats dict (pickled to stats.p_{rank} for offline plotting) and,
when monitoring='tensorboard', also into per-rank TB event files; `add_imgs`
writes PNGs + TB images. TB comes from torch.utils.tensorboard when present
and degrades to file-only logging otherwise.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from neurecon_tpu.utils.console import log


class Logger:
    def __init__(self, log_dir: str, img_dir: Optional[str] = None,
                 monitoring: Optional[str] = None,
                 monitoring_dir: Optional[str] = None,
                 rank: int = 0, is_master: bool = True,
                 multi_process_logging: bool = False):
        self.stats = {}
        self.log_dir = log_dir
        self.img_dir = img_dir or os.path.join(log_dir, "imgs")
        self.rank = rank
        self.is_master = is_master
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.img_dir, exist_ok=True)

        self.tb = None
        if monitoring == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter
                tb_dir = monitoring_dir or os.path.join(log_dir, "events")
                os.makedirs(tb_dir, exist_ok=True)
                self.tb = SummaryWriter(tb_dir)
            except Exception as e:  # pragma: no cover
                log.warning(f"tensorboard unavailable ({e}); file-only logging")

    # ---------------- scalars ----------------
    def add(self, category: str, k: str, v, it: int):
        v = float(np.asarray(v))
        self.stats.setdefault(category, {}).setdefault(k, []).append((it, v))
        if self.tb is not None:
            self.tb.add_scalar(f"{category}/{k}", v, it)

    def add_module_param(self, module_name: str, params, it: int):
        """TB histograms for every leaf of a param pytree (ref logger.py:130-133,
        which iterates nn.Module.named_parameters; here the pytree path plays
        the parameter name)."""
        if self.tb is None:
            return
        import jax
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            self.tb.add_histogram(f"{module_name}/{name}",
                                  np.asarray(leaf).ravel(), it)

    # ---------------- images ----------------
    def add_imgs(self, imgs: np.ndarray, class_name: str, it: int):
        """imgs: [B, H, W, C] or [H, W, C] float in [0, 1] (HWC — no torch CHW)."""
        import imageio.v2 as imageio
        imgs = np.asarray(imgs)
        if imgs.ndim == 3:
            imgs = imgs[None]
        if imgs.shape[-1] == 1:
            imgs = np.repeat(imgs, 3, -1)
        grid = _make_grid(np.clip(imgs, 0.0, 1.0))
        outdir = os.path.join(self.img_dir, class_name)
        os.makedirs(outdir, exist_ok=True)
        path = os.path.join(outdir, f"{it:08d}_{self.rank}.png")
        imageio.imwrite(path, (grid * 255).astype(np.uint8))
        if self.tb is not None:
            self.tb.add_image(class_name, grid, it, dataformats="HWC")

    def add_figure(self, fig, class_name: str, it: int):
        """matplotlib figure -> PNG + TB."""
        import imageio.v2 as imageio
        fig.canvas.draw()
        w, h = fig.canvas.get_width_height()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), np.uint8).reshape(h, w, 4)
        img = buf[..., :3]
        outdir = os.path.join(self.img_dir, class_name)
        os.makedirs(outdir, exist_ok=True)
        imageio.imwrite(os.path.join(outdir, f"{it:08d}_{self.rank}.png"), img)
        if self.tb is not None:
            self.tb.add_image(class_name, img, it, dataformats="HWC")
        import matplotlib.pyplot as plt
        plt.close(fig)

    # ---------------- persistence ----------------
    def _stats_path(self, filename: str) -> str:
        return os.path.join(self.log_dir, f"{filename}_{self.rank}")

    def save_stats(self, filename: str = "stats.p"):
        with open(self._stats_path(filename), "wb") as f:
            pickle.dump(self.stats, f)

    def load_stats(self, filename: str = "stats.p"):
        path = self._stats_path(filename)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    self.stats = pickle.load(f)
                log.info(f"Logger: loaded stats from {path}")
            except EOFError:
                log.warning(f"Logger: corrupt stats file {path}, starting fresh")


def _make_grid(imgs: np.ndarray) -> np.ndarray:
    """[B, H, W, C] -> one [gh*H, gw*W, C] gallery image."""
    B, H, W, C = imgs.shape
    gw = int(np.ceil(np.sqrt(B)))
    gh = int(np.ceil(B / gw))
    grid = np.zeros((gh * H, gw * W, C), imgs.dtype)
    for i in range(B):
        r, c = divmod(i, gw)
        grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = imgs[i]
    return grid
