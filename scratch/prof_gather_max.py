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


def _fetch(out):
    # axon lesson: timings must end with a real element fetch
    return float(np.asarray(out.ravel()[0]))


def timed(name, fn, a, idx, ref=None):
    """Dispatch the same program CHAIN times back-to-back (device executes
    serially; dispatches are async) and fetch once — the prof_trunk_chain
    pattern.  The earlier dependency-chain variant computed an EAGER
    jnp.where on (B, N, K) between dispatches, which dominated the
    measurement and inflated v0 ~5x vs its in-codec cost."""
    f = jax.jit(fn)
    out = f(a, idx)
    if ref is not None:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(CHAIN):
            o = f(a, idx)
        _fetch(o)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:24s} {best * 1000 / CHAIN:8.2f} ms/call", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # locality-matched indices: true-KNN sequence gaps at the bench slicing
    # are p50 1946 / p95 7643 (prof_geo2.py) — random-uniform indices
    # overstate the XLA gather cost ~4x, so draw neighbor offsets from a
    # two-sided geometric-ish profile around each node instead
    scale = float(os.environ.get("GM_SCALE", 2000.0))
    offs = rng.laplace(0.0, scale, (B, N, K)).astype(np.int64)
    base_i = np.arange(N)[None, :, None]
    idx_np = np.clip(base_i + offs, 0, N - 1).astype(np.int32)
    if os.environ.get("GM_RANDOM"):
        idx_np = rng.integers(0, N, (B, N, K)).astype(np.int32)
    for F in (64, 128, 256):
        a = jnp.asarray(rng.standard_normal((B, N, F)), jnp.bfloat16)
        idx = jnp.asarray(idx_np, jnp.int32)
        print(f"--- F={F}")
        ref = timed(f"v0 max(gather) F{F}", v0, a, idx)
        timed(f"v1 scan-k       F{F}", v1, a, idx, ref)
        timed(f"v2 tree5        F{F}", v2, a, idx, ref)
        timed(f"v3 k-major      F{F}", v3, a, idx, ref)


if __name__ == "__main__":
    main()
