"""Test config: force an 8-device virtual CPU platform before jax import.

Multi-device sharding tests run on a simulated mesh
(xla_force_host_platform_device_count), mirroring how the driver validates
the multi-chip path without real chips.

IMPORTANT (this environment): run tests as `PYTHONPATH= python -m pytest` —
the global PYTHONPATH injects a sitecustomize that registers the tunneled
"axon" TPU PJRT plugin into every interpreter, and concurrent JAX processes
deadlock on its single loopback relay. Stripping PYTHONPATH keeps tests on
pure local CPU. (We also scrub the axon path below for the common case, but
sitecustomize has already run by the time conftest is imported.)
"""
import os

os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

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
