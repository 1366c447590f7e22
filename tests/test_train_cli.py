"""End-to-end smoke test of the training entry point + checkpoint resume."""
import os

import numpy as np
import pytest

from neurecon_tpu.config import load_yaml


def _smoke_args(tmp_path, num_iters=30):
    args = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "synthetic_smoke.yaml"))
    args.training["exp_dir"] = str(tmp_path / "exp")
    args.training["num_iters"] = num_iters
    args.training["i_val"] = 25
    args.training["i_log"] = 10
    args.data["H"] = 60
    args.data["W"] = 80
    args.data["N_rays"] = 64
    args.model["N_samples"] = 16
    args.model["N_importance"] = 16
    args.model.surface["W"] = 64
    args.model.surface["D"] = 3
    args.model.surface["skips"] = []
    args.model.radiance["W"] = 64
    return args


class TestTrainCLI:
    def test_train_val_checkpoint_resume(self, tmp_path):
        from neurecon_tpu.train import main_function
        args = _smoke_args(tmp_path, num_iters=30)
        main_function(args)

        exp = args.training.exp_dir
        # config snapshot + code backup written
        assert os.path.exists(os.path.join(exp, "config.yaml"))
        assert os.path.exists(os.path.join(exp, "backup", "train.py"))
        # final checkpoint exists
        ckpts = os.listdir(os.path.join(exp, "ckpts"))
        assert any(c.startswith("final_") for c in ckpts), ckpts
        # validation images were rendered
        val_imgs = os.listdir(os.path.join(exp, "imgs", "val", "predicted_rgb")) \
            if os.path.isdir(os.path.join(exp, "imgs", "val", "predicted_rgb")) \
            else os.listdir(os.path.join(exp, "imgs"))
        assert len(val_imgs) > 0
        # stats saved
        assert os.path.exists(os.path.join(exp, "stats.p_0"))

        # ---- resume: runs further without error, starting from final ckpt ----
        args2 = _smoke_args(tmp_path, num_iters=40)
        args2.training["exp_dir"] = exp
        main_function(args2)
        ckpts2 = os.listdir(os.path.join(exp, "ckpts"))
        assert any(c.startswith("final_000000") and "40" in c for c in ckpts2), ckpts2

    def test_nan_watchdog_saves_forensic_ckpt_and_halts(self, tmp_path):
        """A NaN lr poisons the params after one update -> non-finite loss at
        the next log interval -> the watchdog (train.py:356-371) must save a
        nan_*.pt forensic checkpoint and halt instead of training on."""
        from neurecon_tpu.train import main_function
        args = _smoke_args(tmp_path, num_iters=30)
        args.training["i_val"] = 10_000       # don't render from NaN params
        args.training["lr"] = float("nan")
        with pytest.raises(RuntimeError, match="non-finite"):
            main_function(args)
        ckpts = os.listdir(os.path.join(args.training.exp_dir, "ckpts"))
        assert any(c.startswith("nan_") for c in ckpts), ckpts

    def test_nan_watchdog_halt_disabled_continues(self, tmp_path):
        """halt_on_nan=False keeps training (still saves the forensic ckpt)."""
        from neurecon_tpu.train import main_function
        args = _smoke_args(tmp_path, num_iters=30)
        args.training["i_val"] = 10_000
        args.training["lr"] = float("nan")
        args.training["halt_on_nan"] = False
        main_function(args)
        ckpts = os.listdir(os.path.join(args.training.exp_dir, "ckpts"))
        assert any(c.startswith("nan_") for c in ckpts), ckpts
        assert any(c.startswith("final_") for c in ckpts), ckpts
