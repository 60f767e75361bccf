"""Chained-dispatch timing of the wavefront's expansion/emit programs.

A/B: searchsorted parent lookup (round-3 original) vs the two-sort merge
rank now in production, plus the emit programs, at the bench cloud's big
shapes (B=131072 child cap, out cap 2^20).

Run when the chip is free:  python scratch/prof_expand.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import ehem_codec as ec
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B = 131072          # child buffer cap at the big levels
OUT = 1 << 20       # BFS out cap for the 843k-node cloud
rng = np.random.default_rng(0)

data = jnp.asarray(rng.integers(0, 255, (B, 4, 3)).astype(np.int32))
pos = jnp.asarray(rng.integers(0, 1 << 16, (B, 3)).astype(np.int32))
evens = jnp.asarray(rng.integers(0, 255, B // 2).astype(np.uint8))
odds = jnp.asarray(rng.integers(0, 255, B // 2).astype(np.uint8))
out0 = jnp.zeros(OUT, jnp.uint8)
n_par, n_child = np.int32(110000), np.int32(120000)
lvl, unit = np.int32(12), np.int32(16)


def expand_core_ss(data, pos, occ, n_par, n_child, child_level, unit):
    """Round-3 original: searchsorted parent lookup."""
    b = data.shape[0]
    i = jnp.arange(b, dtype=jnp.int32)
    occ1 = occ.astype(jnp.int32) + 1
    b8 = (occ1[:, None] >> jnp.arange(8, dtype=jnp.int32)) & 1
    cnt = jnp.where(i < n_par, jnp.sum(b8, axis=1), 0)
    cum = jnp.cumsum(cnt)
    parent = jnp.minimum(
        jnp.searchsorted(cum, i, side="right").astype(jnp.int32), b - 1
    )
    rank = i - (jnp.take(cum, parent) - jnp.take(cnt, parent))
    pb8 = jnp.take(b8, parent, axis=0)
    bcum = jnp.cumsum(pb8, axis=1)
    octant = jnp.argmax((bcum == (rank + 1)[:, None]).astype(jnp.int32), axis=1).astype(jnp.int32)
    pdata = jnp.take(data, parent, axis=0)
    row2 = jnp.stack([pdata[:, 3, 0], pdata[:, 3, 1], jnp.take(occ, parent).astype(jnp.int32)], axis=1)
    row3 = jnp.stack([jnp.broadcast_to(child_level.astype(jnp.int32), (b,)), octant + 1, jnp.full((b,), 255, jnp.int32)], axis=1)
    child = jnp.concatenate([pdata[:, 1:3], row2[:, None], row3[:, None]], axis=1)
    bits = jnp.stack([(octant >> 2) & 1, (octant >> 1) & 1, octant & 1], axis=1)
    cpos = jnp.take(pos, parent, axis=0) + bits * unit.astype(jnp.int32)
    valid = i < n_child
    pad_row = jnp.array([0, 0, 255], jnp.int32)
    child = jnp.where(valid[:, None, None], child, pad_row[None, None, :])
    cpos = jnp.where(valid[:, None], cpos, 0)
    return child, cpos


@jax.jit
def expand_ss(data, pos, evens, odds, n_par, n_child, child_level, unit):
    i = jnp.arange(data.shape[0], dtype=jnp.int32)
    occ = jnp.where(i % 2 == 0, jnp.take(evens, i // 2, mode="clip"),
                    jnp.take(odds, i // 2, mode="clip"))
    return expand_core_ss(data, pos, occ, n_par, n_child, child_level, unit)


def chain(name, fn, args, n=20, fetch=lambda o: np.asarray(o[0][0, 0, 0])):
    o = fn(*args)
    fetch(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*args)
    fetch(o)
    wall = time.time() - t0
    print(f"{name:28s} {(wall - 0.025) / n * 1e3:7.2f} ms/call", flush=True)


print(f"backend={jax.default_backend()}", flush=True)
# production (merge-rank) — non-donating wrapper so chaining reuses inputs
prod = jax.jit(lambda d, p, e, o, np_, nc, cl, u: ec._expand_core(
    d, p, jnp.where(jnp.arange(d.shape[0]) % 2 == 0,
                    jnp.take(e, jnp.arange(d.shape[0]) // 2, mode="clip"),
                    jnp.take(o, jnp.arange(d.shape[0]) // 2, mode="clip")).astype(jnp.uint8),
    np_, nc, cl, u))
chain("expand merge-rank (prod)", prod, (data, pos, evens, odds, n_par, n_child, lvl, unit))
chain("expand searchsorted (old)", expand_ss, (data, pos, evens, odds, n_par, n_child, lvl, unit))


@jax.jit
def emit_parity(out, evens, odds, off, n):
    rel = jnp.arange(out.shape[0], dtype=jnp.int32) - off
    val = jnp.where(rel % 2 == 0, jnp.take(evens, rel // 2, mode="clip"),
                    jnp.take(odds, rel // 2, mode="clip"))
    return jnp.where((rel >= 0) & (rel < n), val, out)


chain("emit_parity full-pass (old)", emit_parity,
      (out0, evens, odds, np.int32(500000), np.int32(110000)),
      fetch=lambda o: np.asarray(o[0]))


@jax.jit
def emit_windowed(out, evens, odds, off, n):
    w = 2 * evens.shape[0]
    val = jnp.stack([evens, odds], axis=-1).reshape(-1)
    win = jax.lax.dynamic_slice_in_dim(out, off, w)
    win = jnp.where(jnp.arange(w, dtype=jnp.int32) < n, val, win)
    return jax.lax.dynamic_update_slice_in_dim(out, win, off, 0)


chain("emit_parity windowed (prod)", emit_windowed,
      (out0, evens, odds, np.int32(500000), np.int32(110000)),
      fetch=lambda o: np.asarray(o[0]))
got_old = np.asarray(emit_parity(out0, evens, odds, np.int32(500000), np.int32(110000)))
got_new = np.asarray(emit_windowed(out0, evens, odds, np.int32(500000), np.int32(110000)))
print("emit windowed matches:", (got_old == got_new).all(), flush=True)
