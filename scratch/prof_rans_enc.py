"""Isolate the rANS _encode_chunk cost drivers on chip.

Hypotheses for encode being ~15x slower/symbol than decode:
  (a) uint32 // and % (TPU has no integer divide; XLA emulates)
  (b) the searchsorted byte compaction (131072 queries x log2(65536) gathers)

Variants timed (all same shapes as production _encode_chunk):
  full        — production kernel
  nodiv       — division replaced by a multiply (wrong math, same dataflow)
  f32div      — bounded-range f32 division + integer fixup (candidate fix)
  nocompact   — scan only, no byte compaction
  compactonly — the compaction alone on precomputed cnt/bytes
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import rans
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

K = rans.K_LANES
S = rans.CHUNK_STEPS
CHUNK = rans.CHUNK
RANS_L = rans.RANS_L

rng = np.random.default_rng(0)
# realistic sf: freqs spread over the dynamic range
freq = rng.integers(1, 60000, CHUNK).astype(np.uint32)
start = rng.integers(0, 1000, CHUNK).astype(np.uint32)
sf = jnp.asarray(np.stack([start, freq], -1))
states0 = jnp.full((K,), 1 << 23, jnp.uint32)


def scan_body(div_mode):
    lane = jnp.arange(K, dtype=jnp.int32)

    def step(carry, xs):
        x = carry
        sf_t, t = xs
        active = t * K + lane < CHUNK
        st, fq = sf_t[:, 0], sf_t[:, 1]
        x_max = fq << 15
        c1 = x >= x_max
        c2 = (x >> 8) >= x_max
        cnt = jnp.where(active, c1.astype(jnp.int32) + c2.astype(jnp.int32), 0)
        e0 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        e1 = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8)
        xr = x >> (jnp.uint32(8) * cnt.astype(jnp.uint32))
        cb0 = jnp.where(cnt == 2, e1, e0)
        cb1 = e0
        if div_mode == "full":
            q = xr // fq
            r = xr % fq
        elif div_mode == "nodiv":
            q = xr * fq  # WRONG math, same dataflow cost floor
            r = xr - q
        elif div_mode == "f32div":
            # after renorm xr < fq << 15 so q < 2^15; f32 rel err ~2^-23
            # -> real-valued quotient error < 2^-8; floor off by at most 1
            qf = xr.astype(jnp.float32) / fq.astype(jnp.float32)
            q = qf.astype(jnp.uint32)
            r_s = xr.astype(jnp.int32) - (q * fq).astype(jnp.int32)
            fq_s = fq.astype(jnp.int32)
            too_hi = r_s >= fq_s
            q = jnp.where(too_hi, q + 1, q)
            r_s = jnp.where(too_hi, r_s - fq_s, r_s)
            too_lo = r_s < 0
            q = jnp.where(too_lo, q - 1, q)
            r_s = jnp.where(too_lo, r_s + fq_s, r_s)
            r = r_s.astype(jnp.uint32)
        x_new = (q << 16) + r + st
        x_new = jnp.where(active, x_new, x)
        return x_new, (cb0, cb1, cnt)

    return step


def make_enc(div_mode, compact):
    @jax.jit
    def enc(states, sf):
        ts = jnp.arange(S, dtype=jnp.int32)
        sfr = sf.reshape(S, K, 2)
        states, (cb0, cb1, cnt) = jax.lax.scan(
            scan_body(div_mode), states, (sfr, ts), reverse=True
        )
        if not compact:
            return (jnp.sum(cnt) + states[0].astype(jnp.int32)).astype(jnp.float32)
        cnt_f = cnt.reshape(-1)
        cum = jnp.cumsum(cnt_f)
        total = cum[-1]
        j = jnp.arange(CHUNK * 2, dtype=jnp.int32)
        src = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        src = jnp.minimum(src, CHUNK - 1)
        first = jnp.take(cum, src) - jnp.take(cnt_f, src)
        b0 = jnp.take(cb0.reshape(-1), src)
        b1 = jnp.take(cb1.reshape(-1), src)
        buf = jnp.where(j < total, jnp.where(j == first, b0, b1), 0)
        return jnp.sum(buf.astype(jnp.float32)) + states[0].astype(jnp.float32)

    return enc


@jax.jit
def compact_only(cnt, cb0, cb1):
    cnt_f = cnt.reshape(-1)
    cum = jnp.cumsum(cnt_f)
    total = cum[-1]
    j = jnp.arange(CHUNK * 2, dtype=jnp.int32)
    src = jnp.minimum(jnp.searchsorted(cum, j, side="right").astype(jnp.int32), CHUNK - 1)
    first = jnp.take(cum, src) - jnp.take(cnt_f, src)
    b0 = jnp.take(cb0.reshape(-1), src)
    b1 = jnp.take(cb1.reshape(-1), src)
    buf = jnp.where(j < total, jnp.where(j == first, b0, b1), 0)
    return jnp.sum(buf.astype(jnp.float32))


def timed(name, fn, *args, n=5):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:24s} {med*1e3:8.2f} ms  ({CHUNK/med/1e6:6.1f} Msym/s)", flush=True)
    return med


print(f"backend={jax.default_backend()} chunk={CHUNK}", flush=True)
timed("full", make_enc("full", True), states0, sf)
timed("nodiv", make_enc("nodiv", True), states0, sf)
timed("f32div", make_enc("f32div", True), states0, sf)
timed("full-nocompact", make_enc("full", False), states0, sf)
timed("f32div-nocompact", make_enc("f32div", False), states0, sf)
cnt = jnp.asarray(rng.integers(0, 3, (S, K)).astype(np.int32))
cb0 = jnp.asarray(rng.integers(0, 255, (S, K)).astype(np.uint8))
cb1 = jnp.asarray(rng.integers(0, 255, (S, K)).astype(np.uint8))
timed("compact-only", compact_only, cnt, cb0, cb1)

# correctness of f32div vs integer reference over adversarial inputs
xr = rng.integers(0, 1 << 31, 1 << 20).astype(np.uint32)
fq = rng.integers(1, 1 << 16, 1 << 20).astype(np.uint32)
xr = np.minimum(xr, (fq.astype(np.uint64) << 15).astype(np.uint64) - 1).astype(np.uint32)
# include exact-boundary cases
xr[: 1 << 16] = (fq[: 1 << 16] * rng.integers(0, 1 << 15, 1 << 16)).astype(np.uint32)


@jax.jit
def f32div_pair(xr, fq):
    qf = xr.astype(jnp.float32) / fq.astype(jnp.float32)
    q = qf.astype(jnp.uint32)
    r_s = xr.astype(jnp.int32) - (q * fq).astype(jnp.int32)
    fq_s = fq.astype(jnp.int32)
    too_hi = r_s >= fq_s
    q = jnp.where(too_hi, q + 1, q)
    r_s = jnp.where(too_hi, r_s - fq_s, r_s)
    too_lo = r_s < 0
    q = jnp.where(too_lo, q - 1, q)
    r_s = jnp.where(too_lo, r_s + fq_s, r_s)
    return q, r_s.astype(jnp.uint32)


q, r = map(np.asarray, f32div_pair(jnp.asarray(xr), jnp.asarray(fq)))
ok = (q == xr // fq).all() and (r == xr % fq).all()
print(f"f32div correctness over 2^20 bounded-range cases: {ok}", flush=True)
