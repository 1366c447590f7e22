"""Test config: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Env vars alone are not enough — pytest plugins may import jax before this
conftest runs — so we also set jax.config, which takes effect as long as the
backend has not been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env may say 'axon' (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + jax.devices()[0].platform)
assert jax.device_count() >= 8, "tests need >= 8 virtual CPU devices"


# Tiering (pytest.ini): tests with a measured CPU-mesh duration >= this are
# auto-marked slow, keeping `pytest -m fast` under ~5 min ON A BUSY HOST
# (round-4 verdict #8: the 8.0 s threshold measured 6:26 wall off-idle and
# 6.0 s still 6:04; the wall-to-manifest overhead factor is ~2.2x, so the
# 4.0 s threshold [~120 s manifest sum -> ~4:20 predicted] is the one that
# actually restores the margin. xdist was tried and is a LOSS here — each
# worker pays its own jax init + compiles: -n 4 measured 6:45). Regenerate the manifest after big suite changes with:
#   pytest tests/ -q --durations=0 2>&1 | grep 's call' > /tmp/dur.log
#   python tests/_regen_durations.py /tmp/dur.log
_SLOW_SECONDS = 4.0


def _load_durations():
    import json
    import pathlib
    p = pathlib.Path(__file__).parent / "durations.json"
    try:
        return json.loads(p.read_text())
    except Exception:
        return {}


def pytest_collection_modifyitems(items):
    """Mark tests slow from the measured-duration manifest; everything not
    slow/tpu becomes fast, so `-m fast` is the <5 min gate (pytest.ini).
    New tests without a manifest entry default to fast."""
    import pytest

    durations = _load_durations()
    for item in items:
        nodeid = item.nodeid
        if durations.get(nodeid, 0.0) >= _SLOW_SECONDS:
            item.add_marker(pytest.mark.slow)
        if not any(m.name in ("slow", "tpu") for m in item.iter_markers()):
            item.add_marker(pytest.mark.fast)
