"""Gather strategy micro-bench: vmap-index vs take_along vs one-hot matmul."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

G, N, K, C = 8, 8192, 20, 128
rng = np.random.default_rng(0)
feats = jax.device_put(rng.random((G, N, C), np.float32).astype(np.float32))
idx = jax.device_put(rng.integers(0, N, (G, N, K)).astype(np.int32))
# locality-biased indices (Morton-ordered clouds have mostly-local neighbors)
loc = np.clip(
    np.arange(N)[None, :, None] + rng.integers(-64, 64, (G, N, K)), 0, N - 1
).astype(np.int32)
idx_loc = jax.device_put(loc)


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:40s} {(sorted(ts)[len(ts)//2])*1e3:8.1f} ms", flush=True)


@jax.jit
def g_vmap(f, i):
    a = f.astype(jnp.bfloat16)
    out = jax.vmap(lambda ff, ii: ff[ii])(a, i)
    return jnp.sum(out.astype(jnp.float32))


@jax.jit
def g_vmap_f32(f, i):
    out = jax.vmap(lambda ff, ii: ff[ii])(f, i)
    return jnp.sum(out)


@jax.jit
def g_take_along(f, i):
    a = f.astype(jnp.bfloat16)
    ib = jnp.broadcast_to(i[..., None], (*i.shape, a.shape[-1]))
    out = jnp.take_along_axis(a[:, :, None, :], ib[:, :, :, :], axis=1)
    return jnp.sum(out.astype(jnp.float32))


@jax.jit
def g_flatidx(f, i):
    a = f.astype(jnp.bfloat16).reshape(G * N, C)
    base = (jnp.arange(G, dtype=jnp.int32) * N)[:, None, None]
    out = jnp.take(a, (i + base).reshape(-1), axis=0)
    return jnp.sum(out.astype(jnp.float32))


@jax.jit
def g_sorted_local(f, i):
    a = f.astype(jnp.bfloat16)
    out = jax.vmap(lambda ff, ii: ff[ii])(a, i)
    return jnp.sum(out.astype(jnp.float32))


timed("vmap f[idx] bf16 (current)", g_vmap, feats, idx)
timed("vmap f[idx] f32", g_vmap_f32, feats, idx)
timed("take_along_axis bf16", g_take_along, feats, idx)
timed("flat jnp.take bf16", g_flatidx, feats, idx)
timed("vmap bf16, LOCAL idx", g_sorted_local, feats, idx_loc)
