"""Test config: force an 8-device virtual CPU platform before jax import.

Multi-device sharding tests run on a simulated mesh
(xla_force_host_platform_device_count), mirroring how the driver validates
the multi-chip path without real chips.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
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
