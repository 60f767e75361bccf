"""Environment helpers: platform selection and persistent XLA cache.

Call BEFORE importing jax.  The container pre-sets JAX_PLATFORMS=axon (the
real-TPU tunnel); CPU work must override it explicitly.
"""

from __future__ import annotations

import os


def enable_compilation_cache():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def force_cpu(virtual_devices: int | None = None):
    """Really force CPU.  The container's sitecustomize registers the axon
    TPU plugin and overrides JAX_PLATFORMS, so the env var alone is NOT
    enough — the config must be updated after jax import too."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
