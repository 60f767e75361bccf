"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU behavior is covered by
bench.py / __graft_entry__.py on hardware.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel), which must never be used for tests — eager dispatch over the
# tunnel is orders of magnitude slower and the chip is reserved for bench.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon otherwise

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
