"""Environment helpers: platform selection and persistent XLA cache.

Call BEFORE importing jax.  The container pre-sets JAX_PLATFORMS=axon (the
real-TPU tunnel); CPU work must override it explicitly.
"""

from __future__ import annotations

import os


def enable_compilation_cache():
    """Activate the persistent XLA compilation cache — via jax.config, not
    env.  The container's sitecustomize initializes JAX before user env is
    consulted, so JAX_COMPILATION_CACHE_DIR alone is silently IGNORED on
    the axon backend ("cache is disabled/not initialized"): every process
    paid the full 10-minute warmup compile even with the env var set
    (BENCH_r03's 676 s, round-4's 619 s).  A two-process probe confirms
    jax.config.update works where the env var does not (BUILDLOG round 4).
    The env vars are still set for child processes that import jax fresh
    without the sitecustomize."""
    path = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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
