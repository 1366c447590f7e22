"""Infrastructure tests: checkpoints, logger, schedules, optimizer, dist env."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.config import ConfigDict
from neurecon_tpu.models.base import make_optimizer, make_schedule
from neurecon_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts
from neurecon_tpu.utils.logger import Logger


class TestCheckpointIO:
    def _params(self, v=1.0):
        return {"implicit_surface": {"layers": [{"w": np.full((4, 4), v),
                                                 "b": np.zeros(4)}]},
                "ln_s": np.array([2.0])}

    def test_save_load_roundtrip(self, tmp_path):
        io = CheckpointIO(str(tmp_path))
        io.save("latest.pt", global_step=123, epoch_idx=4,
                model=self._params(3.0), opt_state={"count": np.array(7)})
        out = io.load_file("latest.pt")
        assert out["global_step"] == 123 and out["epoch_idx"] == 4
        np.testing.assert_allclose(
            np.asarray(out["model"]["implicit_surface"]["layers"][0]["w"]), 3.0)

    def test_sorted_ckpts_ordering(self, tmp_path):
        io = CheckpointIO(str(tmp_path))
        for name in ["00010000.pt", "latest.pt", "00050000.pt", "final_100.pt"]:
            io.save(name, global_step=1, model=self._params())
        names = [os.path.basename(p) for p in sorted_ckpts(str(tmp_path))]
        assert names == ["00010000.pt", "00050000.pt", "latest.pt", "final_100.pt"]

    def test_auto_resume_picks_newest(self, tmp_path):
        io = CheckpointIO(str(tmp_path))
        assert io.load_file(None) == {}
        io.save("00010000.pt", global_step=10000, model=self._params(1.0))
        io.save("latest.pt", global_step=11000, model=self._params(2.0))
        out = io.load_file(None)
        assert out["global_step"] == 11000

    def test_auto_resume_prefers_highest_step_after_crash(self, tmp_path):
        """After a crash between a numbered backup and the next periodic
        save, `latest` can be BEHIND the backup (observed mid-run: latest at
        92300 vs backup 00100000); auto-resume must pick the max step, not
        blind reference ordering."""
        io = CheckpointIO(str(tmp_path))
        io.save("00100000.pt", global_step=100000, model=self._params(7.0))
        io.save("latest.pt", global_step=92300, model=self._params(1.0))
        out = io.load_file(None)
        assert out["global_step"] == 100000
        np.testing.assert_allclose(
            np.asarray(out["model"]["implicit_surface"]["layers"][0]["w"]), 7.0)
        # a corrupt candidate (crash mid-save) is skipped, not fatal
        with open(str(tmp_path / "final_00100050.pt"), "wb") as f:
            f.write(b"\x80truncated")
        out = io.load_file(None)
        assert out["global_step"] == 100000

    def test_url_loading_via_file_scheme(self, tmp_path):
        src = CheckpointIO(checkpoint_dir=str(tmp_path / "src"))
        p = src.save("m.pt", global_step=3, model={"w": np.ones(2)})
        dst = CheckpointIO(checkpoint_dir=str(tmp_path / "dst"))
        out = dst.load_file(f"file://{p}")
        assert out["global_step"] == 3
        # cache file is keyed by a hash of the full url + basename (two urls
        # ending in the same basename must not collide)
        zoo = [f for f in os.listdir(str(tmp_path / "dst" / "_zoo"))
               if f.endswith("_m.pt")]
        assert len(zoo) == 1
        # second load hits the cache (no re-download path issues)
        out2 = dst.load_file(f"file://{p}")
        assert out2["global_step"] == 3
        # a DIFFERENT url with the same basename gets its own cache entry
        src2 = CheckpointIO(checkpoint_dir=str(tmp_path / "src2"))
        p2 = src2.save("m.pt", global_step=7, model={"w": np.zeros(2)})
        out3 = dst.load_file(f"file://{p2}")
        assert out3["global_step"] == 7
        zoo = [f for f in os.listdir(str(tmp_path / "dst" / "_zoo"))
               if f.endswith("_m.pt")]
        assert len(zoo) == 2

    def test_key_filters(self, tmp_path):
        io = CheckpointIO(str(tmp_path))
        io.save("x.pt", model=self._params())
        out = io.load_file("x.pt", ignore_keys=["ln_s"])
        assert "ln_s" not in out["model"]
        out = io.load_file("x.pt", only_use_keys=["ln_s"])
        assert list(out["model"].keys()) == ["ln_s"]


class TestLogger:
    def test_scalars_images_stats(self, tmp_path):
        lg = Logger(str(tmp_path), monitoring=None)
        for it in range(5):
            lg.add("losses", "total", 1.0 / (it + 1), it)
        lg.add_imgs(np.random.rand(2, 8, 8, 3), "val/rgb", 0)
        lg.save_stats("stats.p")
        lg2 = Logger(str(tmp_path), monitoring=None)
        lg2.load_stats("stats.p")
        assert len(lg2.stats["losses"]["total"]) == 5
        assert os.path.exists(os.path.join(str(tmp_path), "imgs", "val", "rgb",
                                           "00000000_0.png"))

    def test_add_module_param_histograms(self, tmp_path):
        # with TB available, every pytree leaf becomes one histogram
        lg = Logger(str(tmp_path), monitoring="tensorboard",
                    monitoring_dir=str(tmp_path / "events"))
        params = {"layers": [{"w": np.random.randn(4, 3), "b": np.zeros(4)}],
                  "ln_s": np.ones(1)}
        lg.add_module_param("model", params, 7)  # no crash; events written
        if lg.tb is not None:
            lg.tb.flush()
            assert any(f.startswith("events") for f in
                       os.listdir(str(tmp_path / "events")))
        # no-TB logger: silent no-op
        Logger(str(tmp_path), monitoring=None).add_module_param("m", params, 0)


class TestSchedules:
    def _args(self, sched, num_iters=1000):
        return ConfigDict({"training": {"lr": 1e-3, "num_iters": num_iters,
                                        "scheduler": sched}})

    def test_warmupcosine(self):
        f = make_schedule(self._args({"type": "warmupcosine",
                                      "warmup_steps": 100, "min_factor": 0.1}))
        assert abs(float(f(50)) - 0.5) < 1e-5       # linear warmup
        assert abs(float(f(100)) - 1.0) < 1e-5      # peak
        assert abs(float(f(1000)) - 0.1) < 1e-4     # decays to min_factor

    def test_exponential_step(self):
        f = make_schedule(self._args({"type": "exponential_step",
                                      "min_factor": 0.1}))
        assert abs(float(f(0)) - 1.0) < 1e-6
        assert abs(float(f(1000)) - 0.1) < 1e-5
        assert abs(float(f(500)) - 10 ** -0.5) < 1e-4

    def test_multistep(self):
        f = make_schedule(self._args({"type": "multistep",
                                      "milestones": [200, 400], "gamma": 0.5}))
        assert float(f(100)) == 1.0
        assert float(f(250)) == 0.5
        assert float(f(450)) == 0.25

    def test_per_module_lr_dict(self):
        args = ConfigDict({"training": {
            "lr": {"default": 1e-3, "ln_s": 1e-2},
            "num_iters": 100,
            "scheduler": {"type": "multistep", "milestones": [50], "gamma": 0.5}}})
        params = {"ln_s": jnp.zeros((1,)), "net": {"w": jnp.zeros((2, 2))}}
        opt = make_optimizer(args, params)
        state = opt.init(params)
        grads = {"ln_s": jnp.ones((1,)), "net": {"w": jnp.ones((2, 2))}}
        updates, _ = opt.update(grads, state, params)
        # ln_s gets 10x the lr of the default group
        ratio = float(jnp.abs(updates["ln_s"][0])) / float(
            jnp.abs(updates["net"]["w"][0, 0]))
        assert abs(ratio - 10.0) < 0.5


class TestDistEnv:
    def test_single_host_init(self):
        from neurecon_tpu.parallel.distributed import (get_rank, get_world_size,
                                                       init_env, is_master)
        rank, local_rank, world = init_env()
        assert rank == 0 and world == 1 and is_master()
