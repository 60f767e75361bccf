"""EdgeConv fused gather+max A/B on chip (chained-dispatch timing).

The inference EdgeConv collapses to `max_k(gather(a, idx)) + bc`; the
standalone probes (prof_trunk_chain.py) show gather+max at 11/11/18 ms
for F=64/128/256 at (8, 8192, 20) while the bare flat gather is ~3 ms —
XLA materializes the (B, N, k, F) gathered tensor to HBM and re-reads it
for the reduce.  Variants that avoid the k-wide intermediate:

  v0  max(gather(...), axis=2)                 (current production form)
  v1  lax.scan over k, acc = maximum(acc, take(flat, idx_k))
  v2  unrolled tree max over groups of 5 gathers
  v3  k-major gather: take(flat, idx^T flat) -> (k, B*N, F), max axis 0

    python scratch/prof_gather_max.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, K = 8, 8192, 20
CHAIN = 10


def flat_idx(idx):
    base = (jnp.arange(B, dtype=idx.dtype) * N)[:, None, None]
    return (idx + base).reshape(-1)


def v0(a, idx):
    flat = a.reshape(B * N, -1)
    g = jnp.take(flat, flat_idx(idx), axis=0).reshape(B, N, K, -1)
    return jnp.max(g, axis=2)


def v1(a, idx):
    flat = a.reshape(B * N, -1)
    base = (jnp.arange(B, dtype=idx.dtype) * N)[:, None]
    idx_k = jnp.moveaxis(idx, -1, 0)  # (K, B, N)

    def body(acc, ik):
        rows = jnp.take(flat, (ik + base).reshape(-1), axis=0)
        return jnp.maximum(acc, rows.reshape(B, N, -1)), None

    acc0 = jnp.full((B, N, a.shape[-1]), -jnp.inf, a.dtype)
    out, _ = jax.lax.scan(body, acc0, idx_k)
    return out


def v2(a, idx, group=5):
    flat = a.reshape(B * N, -1)
    fi = flat_idx(idx).reshape(B, N, K)
    outs = []
    for s in range(0, K, group):
        g = jnp.take(flat, fi[:, :, s:s + group].reshape(-1), axis=0)
        outs.append(jnp.max(g.reshape(B, N, -1, a.shape[-1]), axis=2))
    acc = outs[0]
    for o in outs[1:]:
        acc = jnp.maximum(acc, o)
    return acc


def v3(a, idx):
    flat = a.reshape(B * N, -1)
    base = (jnp.arange(B, dtype=idx.dtype) * N)[:, None, None]
    km = jnp.moveaxis(idx + base, -1, 0).reshape(-1)  # k-major flat
    g = jnp.take(flat, km, axis=0).reshape(K, B, N, -1)
    return jnp.max(g, axis=0)


def timed(name, fn, a, idx, ref=None):
    f = jax.jit(fn)
    out = f(a, idx)
    out.block_until_ready()
    if ref is not None:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    t0 = time.perf_counter()
    o = out
    for _ in range(CHAIN):
        o = f(a, jnp.where(o[0, 0, 0] < jnp.inf, idx, idx))  # chain dep
    o.block_until_ready()
    dt = (time.perf_counter() - t0) * 1000 / CHAIN
    print(f"{name:24s} {dt:8.2f} ms/call", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    for F in (64, 128, 256):
        a = jnp.asarray(rng.standard_normal((B, N, F)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
        print(f"--- F={F}")
        ref = timed(f"v0 max(gather) F{F}", v0, a, idx)
        timed(f"v1 scan-k       F{F}", v1, a, idx, ref)
        timed(f"v2 tree5        F{F}", v2, a, idx, ref)
        timed(f"v3 k-major      F{F}", v3, a, idx, ref)


if __name__ == "__main__":
    main()
