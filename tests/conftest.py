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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
