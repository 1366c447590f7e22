"""Standing toolchain probes (docs/methods.md round-3 case study)."""
import numpy as np


class TestLaxMapProbe:
    def test_unrolled_microchunk_matches_plain_jit(self):
        """The production workaround for the lax.map sampler divergence is
        the UNROLLED microchunk walk (training.render_full_image
        microchunk_unroll=True). Its invariant — straight-line-unrolled ==
        plain jit, exactly — must hold on every backend; the mapped path's
        divergence is recorded as informational (nonzero is the known,
        root-caused state: scan-body vs straight-line fusion differences
        amplified by the iterated resample)."""
        from neurecon_tpu.tools.probe_lax_map import run_probe

        r = run_probe()
        assert r["unroll_div_frac"] == 0.0, r
        # the mapped path may diverge (known); it must at least stay finite
        # and bounded — an explosion would indicate a genuinely new breakage
        assert np.isfinite(r["map_div_frac"]) and r["map_div_frac"] < 0.05, r
