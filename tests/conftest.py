"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware by running on a CPU
mesh (`xla_force_host_platform_device_count`), per the build contract. All
unit tests therefore run on CPU; the real-chip path is exercised by bench.py.

NOTE: this environment's sitecustomize imports jax at interpreter startup
(registering the experimental 'axon' TPU backend), so JAX_PLATFORMS env vars
set here are too late — the platform must be overridden programmatically
*before* any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
