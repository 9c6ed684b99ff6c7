"""Test configuration: force an 8-device virtual CPU mesh.

Must set env BEFORE jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time ('axon,cpu');
# force CPU explicitly so tests never dispatch over the TPU tunnel.
# RATRACK_TPU_TESTS=1 opts OUT of the forcing for the real-hardware
# numerics tests (tests/test_split_parts_tpu.py) — run those alone:
#   RATRACK_TPU_TESTS=1 python -m pytest tests/test_split_parts_tpu.py
if os.environ.get("RATRACK_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box has ONE cpu core, and the suite's
# wall clock is dominated by model-sized XLA compiles (~20-40s each).
# Caching them makes every run after the first take seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
