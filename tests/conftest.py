"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize registers the TPU plugin and force-sets
# jax_platforms="axon,cpu" at interpreter start; override it back to CPU so
# the suite never rides the single-chip tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Slow tier (suite <400s gate): tests whose FULL coverage the driver
# already exercises out-of-band every round (the multi-chip dryrun →
# MULTICHIP_r*.json) are marked `slow` and skipped unless RUN_SLOW=1 —
# their constituent paths stay covered by the default-tier unit tests.
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (driver-covered) — set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


# Suite wall-clock is dominated by XLA:CPU compiles of the jitted train/eval
# programs. Persist them: the first run pays, every habitual re-run is fast.
_CACHE = os.environ.get("RGL_TPU_TEST_CACHE", "/tmp/rgl_tpu_test_xla_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
