"""Test configuration: force XLA-CPU with 8 virtual devices.

The full suite runs anywhere (CI included) by treating XLA-CPU as the fake
backend; sharding tests use the 8 virtual devices.  Must run before jax
initializes, hence the env mutation at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
