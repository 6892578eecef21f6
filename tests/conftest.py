"""Test bootstrap: force CPU with 8 virtual devices BEFORE jax initializes,
so mesh/sharding tests run without a TPU slice (standard JAX trick,
SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize imports jax at interpreter start, which latches
# JAX_PLATFORMS=axon before this file runs — override through the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the jitted train step is a large graph and
# CPU compiles dominate test wall-clock; cache hits make re-runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (2-process jax.distributed "
        "bring-up); deselect with -m 'not slow'")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
