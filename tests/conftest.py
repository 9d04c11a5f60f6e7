"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is not available in CI; sharding tests run on
``xla_force_host_platform_device_count=8`` CPU devices (SURVEY.md §7 step 7).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's jax plugin pins jax_platforms to "axon,cpu" regardless of the
# env var; force CPU through the config API before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the full-train-step CPU compiles take 1-2 min each;
# caching them makes suite re-runs dramatically cheaper
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
