"""Tunnel roundtrip latency + KNN variants + dispatch pipelining slope."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()


@jax.jit
def tiny(x):
    return x + 1.0


x = jnp.float32(1.0)
np.asarray(tiny(x))
ts = []
for _ in range(10):
    t0 = time.time()
    np.asarray(tiny(x))
    ts.append(time.time() - t0)
print(f"scalar roundtrip: min {min(ts)*1e3:.1f} med {sorted(ts)[5]*1e3:.1f} ms", flush=True)

# pipelined dispatch slope: k dispatches, fetch last
for k in (1, 4, 8):
    t0 = time.time()
    y = x
    for _ in range(k):
        y = tiny(y)
    np.asarray(y)
    print(f"chained x{k}: {(time.time()-t0)*1e3:.1f} ms", flush=True)

# upload cost: 1MB, 8MB
for mb in (1, 8):
    a = np.zeros((mb * 1024 * 1024 // 4,), np.float32)
    np.asarray(tiny(jnp.asarray(a))[:4])
    t0 = time.time()
    np.asarray(tiny(jnp.asarray(a))[:4])
    print(f"upload {mb}MB: {(time.time()-t0)*1e3:.1f} ms", flush=True)

# download cost
for mb in (1, 8):
    n = mb * 1024 * 1024 // 4
    b = jnp.zeros((n,), jnp.float32) + 1.0
    np.asarray(b)
    t0 = time.time()
    np.asarray(b)
    print(f"download {mb}MB (cached buf): {(time.time()-t0)*1e3:.1f} ms", flush=True)


@jax.jit
def make(n):
    return jnp.arange(n, dtype=jnp.float32)


for mb in (1, 8):
    n = mb * 1024 * 1024 // 4
    c = make(n)
    np.asarray(c)
    t0 = time.time()
    c2 = make(n) * 2.0
    np.asarray(c2)
    print(f"compute+download {mb}MB: {(time.time()-t0)*1e3:.1f} ms", flush=True)

# KNN variants on (8, 8192, 192) bf16
from scp_tpu.ops import knn as knn_mod

feats = np.random.default_rng(0).random((8, 8192, 192), np.float32)


def time_knn(chunk, note):
    knn_mod._KNN_CHUNK = chunk

    @jax.jit
    def f(x):
        idx = knn_mod.knn_indices(x.astype(jnp.bfloat16), 20)
        return jnp.sum(idx.astype(jnp.float32))

    np.asarray(f(feats))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(feats))
        ts.append(time.time() - t0)
    print(f"knn chunk={chunk:5d} {note}: {sorted(ts)[1]*1e3:.1f} ms", flush=True)


time_knn(1024, "(current)")
time_knn(2048, "")
time_knn(4096, "")
time_knn(8192, "(no map)")
