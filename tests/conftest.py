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


def pytest_collection_modifyitems(items):
    """Auto-mark anything not slow/tpu as fast, so `-m fast` is the
    complement of `-m slow` without touching every test (pytest.ini)."""
    import pytest

    for item in items:
        if not any(m.name in ("slow", "tpu") for m in item.iter_markers()):
            item.add_marker(pytest.mark.fast)
