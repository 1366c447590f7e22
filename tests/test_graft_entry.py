"""Driver-interface tests: entry() compiles, dryrun_multichip(8) executes."""
import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestGraftEntry:
    def test_entry_jits(self):
        import __graft_entry__ as g
        fn, example = g.entry()
        rgb, depth = jax.jit(fn)(*example)
        assert rgb.shape == (128, 3) and depth.shape == (128,)
        assert np.all(np.isfinite(np.asarray(rgb)))

    def test_dryrun_multichip(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)
