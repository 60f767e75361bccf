"""Chained-dispatch timing: dispatch N dependent chunk programs, fetch once.
Device compute per chunk = (wall - 1 latency) / N.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import rans
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

K, S, CHUNK = rans.K_LANES, rans.CHUNK_STEPS, rans.CHUNK
rng = np.random.default_rng(0)
freq = rng.integers(1, 60000, CHUNK).astype(np.uint32)
start = rng.integers(0, 1000, CHUNK).astype(np.uint32)
sf = jnp.asarray(np.stack([start, freq], -1))
states0 = jnp.full((K,), 1 << 23, jnp.uint32)
N_CALLS = 26  # two clouds' worth


def make_enc(compact):
    lane = jnp.arange(K, dtype=jnp.int32)

    def step(carry, xs):
        x = carry
        sf_t, t = xs
        active = t * K + lane < CHUNK
        st, fq = sf_t[:, 0], sf_t[:, 1]
        x_max = fq << 15
        cnt = jnp.where(
            active,
            (x >= x_max).astype(jnp.int32) + ((x >> 8) >= x_max).astype(jnp.int32),
            0,
        )
        e0 = x & jnp.uint32(0xFF)
        e1 = (x >> 8) & jnp.uint32(0xFF)
        xr = x >> (jnp.uint32(8) * cnt.astype(jnp.uint32))
        cb0 = jnp.where(cnt == 2, e1, e0)
        cb1 = e0
        x_new = ((xr // fq) << 16) + (xr % fq) + st
        x_new = jnp.where(active, x_new, x)
        packed = (cnt.astype(jnp.uint32) << 16) | (cb0 << 8) | cb1
        return x_new, packed

    @jax.jit
    def enc(states, sf):
        ts = jnp.arange(S, dtype=jnp.int32)
        sfr = sf.reshape(S, K, 2)
        states, packed = jax.lax.scan(step, states, (sfr, ts), reverse=True)
        if compact == "none":
            return states, packed[0, 0].astype(jnp.float32)
        p = packed.reshape(-1)
        cnt = (p >> 16).astype(jnp.int32)
        cb0 = (p >> 8) & jnp.uint32(0xFF)
        cb1 = p & jnp.uint32(0xFF)
        pos = (jnp.cumsum(cnt) - cnt).astype(jnp.uint32)
        if compact == "sort":
            INF = jnp.uint32(0xFFFFFFFF)
            k0 = jnp.where(cnt >= 1, (pos << 8) | cb0, INF)
            k1 = jnp.where(cnt == 2, ((pos + 1) << 8) | cb1, INF)
            keys = jnp.sort(jnp.concatenate([k0, k1]))
            buf = (keys & jnp.uint32(0xFF)).astype(jnp.uint8)
        else:  # searchsorted (production)
            cum = jnp.cumsum(cnt)
            total = cum[-1]
            j = jnp.arange(CHUNK * 2, dtype=jnp.int32)
            src = jnp.minimum(
                jnp.searchsorted(cum, j, side="right").astype(jnp.int32), CHUNK - 1
            )
            first = jnp.take(cum, src) - jnp.take(cnt, src)
            b0 = jnp.take(cb0, src)
            b1 = jnp.take(cb1, src)
            buf = jnp.where(
                j < total, jnp.where(j == first, b0, b1), 0
            ).astype(jnp.uint8)
        return states, buf[0].astype(jnp.float32)

    return enc


def chain_timed(name, fn, n=N_CALLS):
    s = states0
    s, out = fn(s, sf)
    float(out)  # compile
    t0 = time.time()
    s = states0
    for _ in range(n):
        s, out = fn(s, sf)
    float(out)
    wall = time.time() - t0
    per = (wall - 0.025) / n
    print(f"{name:28s} {per*1e3:7.2f} ms/chunk ({CHUNK/per/1e6:6.1f} Msym/s)  wall={wall:.3f}", flush=True)


print(f"backend={jax.default_backend()}", flush=True)
chain_timed("scan only", make_enc("none"))
chain_timed("scan+searchsorted", make_enc("searchsorted"))
chain_timed("scan+sortcompact", make_enc("sort"))

# decode-side chained for comparison
rows16 = jnp.asarray(rng.integers(1, 255, (CHUNK, 256)).astype(np.uint16))
stream = jnp.asarray(rng.integers(0, 255, 1 << 20).astype(np.uint8))


def chain_dec(n=N_CALLS):
    st, ptr = states0 + 0, jnp.int32(0)
    rows_c = rows16.reshape(S, K, 256)
    syms, st2, ptr2 = rans._decode_chunk(st, ptr, stream, rows_c, jnp.int32(0), jnp.int32(CHUNK))
    np.asarray(syms[0, 0])
    t0 = time.time()
    st, ptr = states0 + 0, jnp.int32(0)
    for _ in range(n):
        syms, st, ptr = rans._decode_chunk(st, ptr, stream, rows_c, jnp.int32(0), jnp.int32(CHUNK))
    np.asarray(syms[0, 0])
    wall = time.time() - t0
    per = (wall - 0.025) / n
    print(f"{'decode chunk (prod)':28s} {per*1e3:7.2f} ms/chunk ({CHUNK/per/1e6:6.1f} Msym/s)  wall={wall:.3f}", flush=True)


chain_dec()
