"""Bisect DGCNN geo internals on chip (device-resident, scalar fetch)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scp_tpu.ops.knn import gather_neighbors, knn_indices
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

G, N, K = 8, 8192, 20
rng = np.random.default_rng(0)


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:40s} {(sorted(ts)[len(ts)//2])*1e3:8.1f} ms", flush=True)


f144 = jax.device_put(rng.random((G, N, 144), np.float32).astype(np.float32))
f192 = jax.device_put(rng.random((G, N, 192), np.float32).astype(np.float32))
idx = jax.device_put(rng.integers(0, N, (G, N, K)).astype(np.int32))


@jax.jit
def knn144(f):
    return jnp.sum(knn_indices(f.astype(jnp.bfloat16), K).astype(jnp.float32))


@jax.jit
def gather128(f, idx):
    a = f[:, :, :128].astype(jnp.bfloat16)
    return jnp.sum(gather_neighbors(a, idx).astype(jnp.float32))


@jax.jit
def gather_max128(f, idx):
    a = f[:, :, :128].astype(jnp.bfloat16)
    h = gather_neighbors(a, idx) + a[:, :, None, :]
    h = nn.leaky_relu(h, 0.2)
    return jnp.sum(jnp.max(h, axis=2).astype(jnp.float32))


@jax.jit
def bn_stats128(f, idx):
    a = f[:, :, :128].astype(jnp.bfloat16)
    h = gather_neighbors(a, idx)
    mu = jnp.mean(h.astype(jnp.float32), axis=(0, 1, 2))
    var = jnp.var(h.astype(jnp.float32), axis=(0, 1, 2))
    return jnp.sum(mu) + jnp.sum(var)


timed("knn (8,8192,144)", knn144, f144)
timed("knn (8,8192,192)", knn144, f192)
timed("gather (..,20,128) only", gather128, f144, idx)
timed("gather+add+lrelu+max", gather_max128, f144, idx)
timed("gather+bn-stats", bn_stats128, f144, idx)

# full geo for reference
from scp_tpu.models.ehem import EHEM

model = EHEM(dtype=jnp.bfloat16)
data = np.stack(
    [rng.integers(0, 17, (G, N, 4)), rng.integers(0, 9, (G, N, 4)),
     rng.integers(0, 255, (G, N, 4))], -1).astype(np.int32)
pos = rng.random((G, N, 3), dtype=np.float32)
variables = jax.device_put(model.init(jax.random.PRNGKey(0), data[:1, :16], pos[:1, :16]))
flat = jax.device_put(data.reshape(G, N, -1)[:, :, :-1])
pos_d = jax.device_put(pos)


@jax.jit
def geo_fn(v, flat, pos):
    out = model.apply(v, flat, pos, train=False,
                      method=lambda m, f, p, train: m.geo(f, p, train=train))
    return jnp.sum(out.astype(jnp.float32))


timed("geo full", geo_fn, variables, flat, pos_d)
