"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU behavior is covered by
bench.py / __graft_entry__.py on hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
