"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU mesh instead.  NOTE: the ambient axon TPU plugin
ignores the JAX_PLATFORMS env var, so we must use jax.config after
import — before any test module touches a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: golden/frame tests compile minutes of
# XLA:CPU each; repeat CI runs on an unchanged graph hit the cache and
# the "not slow" tier fits the 10-minute 1-core budget.
from datum_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
