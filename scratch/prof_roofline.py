"""Chip roofline calibration: HBM BW, MXU peak, dispatch latency floor."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timed(name, fn, *args, n=5):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:34s} {med*1e3:8.1f} ms", flush=True)
    return med


@jax.jit
def lat(x):
    return x + 1.0


t_lat = timed("latency floor (scalar)", lat, jnp.float32(0))

# HBM: sum of a 1 GB bf16 array (read 1 GB)
big = jnp.ones((512 * 1024 * 1024,), jnp.bfloat16)  # 1 GB


@jax.jit
def hbm_read(x):
    return jnp.sum(x.astype(jnp.float32))


t = timed("read 1GB bf16 (sum)", hbm_read, big) - t_lat
print(f"  -> HBM read BW ~ {1.0 / max(t, 1e-9):.0f} GB/s", flush=True)

# copy 0.5 GB -> measures read+write
half = jnp.ones((256 * 1024 * 1024,), jnp.bfloat16)


@jax.jit
def hbm_rw(x):
    y = x * jnp.bfloat16(2.0)
    return jnp.sum(y.astype(jnp.float32))  # forces materialize? may fuse...


t = timed("mul+sum 0.5GB bf16", hbm_rw, half) - t_lat
print(f"  -> ~{0.5 / max(t, 1e-9):.0f} GB/s effective", flush=True)

# MXU: 8192^3 bf16 matmul = 1.1 TFLOP
a = jnp.ones((8192, 8192), jnp.bfloat16)


@jax.jit
def mm(a):
    return jnp.sum(
        jnp.dot(a, a, preferred_element_type=jnp.float32).astype(jnp.float32)
    ) * 1e-9


t = timed("matmul 8192^3 bf16", mm, a) - t_lat
fl = 2 * 8192**3
print(f"  -> MXU ~ {fl / max(t, 1e-9) / 1e12:.1f} TFLOP/s", flush=True)

# 4x bigger matmul for stable timing: (16384, 16384)
b = jnp.ones((16384, 16384), jnp.bfloat16)


@jax.jit
def mm2(b):
    return jnp.sum(
        jnp.dot(b, b, preferred_element_type=jnp.float32).astype(jnp.float32)
    ) * 1e-9


t = timed("matmul 16384^3 bf16", mm2, b) - t_lat
fl = 2 * 16384**3
print(f"  -> MXU ~ {fl / max(t, 1e-9) / 1e12:.1f} TFLOP/s", flush=True)
