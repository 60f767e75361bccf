"""Find the rANS per-step cost driver: step count vs per-step work."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:44s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", flush=True)


# decode-like scan at various (S, K), fixed total work 16384 syms
stream = jnp.asarray(rng.integers(0, 255, 1 << 20).astype(np.uint8))


def make_dec(S, K):
    rows_np = rng.integers(1, 255, (S, K, 256)).astype(np.uint16)

    @jax.jit
    def dec(states, ptr, rows):
        L = jnp.uint32(1 << 23)

        def step(carry, xs):
            x, p = carry
            r16, t = xs
            r = r16.astype(jnp.int32)
            slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            sym = jnp.sum(r[:, :255] <= slot[:, None], axis=-1) - 1
            start = jnp.take_along_axis(r, sym[:, None], axis=-1)[:, 0]
            top = jnp.take_along_axis(r, jnp.minimum(sym + 1, 255)[:, None], axis=-1)[:, 0]
            freq = jnp.maximum(top - start, 1).astype(jnp.uint32)
            x2 = freq * (x >> 16) + slot.astype(jnp.uint32)
            cnt = (x2 < L).astype(jnp.int32) + (x2 < jnp.uint32(1 << 15)).astype(jnp.int32)
            offs = jnp.cumsum(cnt) - cnt
            b0 = jnp.take(stream, p + offs, mode="clip").astype(jnp.uint32)
            b1 = jnp.take(stream, p + offs + 1, mode="clip").astype(jnp.uint32)
            x3 = jnp.where(cnt >= 1, (x2 << 8) | b0, x2)
            x3 = jnp.where(cnt == 2, (x3 << 8) | b1, x3)
            return (x3, p + jnp.sum(cnt)), sym.astype(jnp.uint8)

        ts = jnp.arange(S, dtype=jnp.int32)
        (states, ptr), syms = jax.lax.scan(step, (states, ptr), (rows, ts))
        return jnp.sum(syms.astype(jnp.float32)) + states[0].astype(jnp.float32)

    return dec, jnp.asarray(rows_np)


for S, K in ((16, 1024), (4, 4096), (64, 256), (16, 4096)):
    dec, rows = make_dec(S, K)
    states = jnp.full((K,), 1 << 23, jnp.uint32)
    timed(f"dec-like scan S={S} K={K} ({S*K} syms)", dec, states, jnp.int32(0), rows)

# strip variants at S=16,K=1024: which part is slow?
S, K = 16, 1024
rows_np = rng.integers(1, 255, (S, K, 256)).astype(np.uint16)
rows_d = jnp.asarray(rows_np)


@jax.jit
def no_bytes(states, rows):
    def step(x, r16):
        r = r16.astype(jnp.int32)
        slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        sym = jnp.sum(r[:, :255] <= slot[:, None], axis=-1) - 1
        start = jnp.take_along_axis(r, sym[:, None], axis=-1)[:, 0]
        freq = jnp.maximum(start, 1).astype(jnp.uint32)
        x2 = freq * (x >> 16) + slot.astype(jnp.uint32)
        return x2, sym.astype(jnp.uint8)

    states, syms = jax.lax.scan(step, states, rows)
    return jnp.sum(syms.astype(jnp.float32)) + states[0].astype(jnp.float32)


@jax.jit
def no_search(states, ptr, rows):
    def step(carry, r16):
        x, p = carry
        slot = (x & jnp.uint32(0xFFFF)).astype(jnp.uint32)
        x2 = (x >> 16) + slot
        cnt = (x2 < jnp.uint32(1 << 23)).astype(jnp.int32) * 2
        offs = jnp.cumsum(cnt) - cnt
        b0 = jnp.take(stream, p + offs, mode="clip").astype(jnp.uint32)
        x3 = (x2 << 8) | b0
        return (x3, p + jnp.sum(cnt)), (x3 & jnp.uint32(0xFF)).astype(jnp.uint8)

    (states, ptr), syms = jax.lax.scan(step, (states, ptr), rows[:, :, 0])
    return jnp.sum(syms.astype(jnp.float32)) + states[0].astype(jnp.float32)


states = jnp.full((K,), 1 << 23, jnp.uint32)
timed("scan searchsorted only (no byte gather)", no_bytes, states, rows_d)
timed("scan byte gather only (no searchsorted)", no_search, states, jnp.int32(0), rows_d)

# encode-like: div cost
sf_np = np.stack(
    [rng.integers(0, 60000, (S, K)).astype(np.uint32),
     rng.integers(1, 5000, (S, K)).astype(np.uint32)], -1
)
sf_d = jnp.asarray(sf_np)


@jax.jit
def enc_div(states, sf):
    def step(x, sf_t):
        start, freq = sf_t[:, 0], sf_t[:, 1]
        x2 = ((x // freq) << 16) + (x % freq) + start
        return jnp.maximum(x2 & jnp.uint32(0x7FFFFFFF), jnp.uint32(1 << 23)), None

    states, _ = jax.lax.scan(step, states, sf)
    return states[0].astype(jnp.float32)


@jax.jit
def enc_nodiv(states, sf):
    def step(x, sf_t):
        start, freq = sf_t[:, 0], sf_t[:, 1]
        x2 = ((x >> 8) << 16) + (x & jnp.uint32(0xFF)) + start + freq
        return jnp.maximum(x2 & jnp.uint32(0x7FFFFFFF), jnp.uint32(1 << 23)), None

    states, _ = jax.lax.scan(step, states, sf)
    return states[0].astype(jnp.float32)


timed("enc-like scan WITH u32 div/mod", enc_div, states, sf_d)
timed("enc-like scan without div", enc_nodiv, states, sf_d)
