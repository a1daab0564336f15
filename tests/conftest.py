"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware by running on a CPU
mesh (`xla_force_host_platform_device_count`), per the build contract. All
unit tests therefore run on CPU; the real-chip path is exercised by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
