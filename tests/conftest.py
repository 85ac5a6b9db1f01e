import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path).
os.environ["JAX_PLATFORMS"] = "cpu"  # override the preset axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Geometry oracle tests compare against float64 OpenCV references.
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; re-assert pure-CPU here (before any backend init)
# so tests compile locally and float64 oracle comparisons work.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
