"""Decode-chunk cost drivers + candidate fixes, chained-dispatch timing.

Production step: (a) sym search = compare-sum over (K,255); (b) 3x
take_along_axis row gathers for start/top; (c) 2x jnp.take from the 1MB
stream.  Candidates:
  redux  — start/top via masked max/min reductions (no row gathers)
  slice  — stream bytes via dynamic_slice(p, 2048) then tiny-array gather
  both   — both
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
RANS_L, HALF_L = rans.RANS_L, rans.HALF_L
rng = np.random.default_rng(0)
# production-valid CDF rows (logits_to_cdf guarantees monotone u16)
from scp_tpu.codec.ehem_codec import logits_to_cdf
_logits = rng.normal(0, 3, (CHUNK, 255)).astype(np.float32)
rows16 = jax.device_put(logits_to_cdf(jnp.asarray(_logits)).astype(jnp.uint16))
stream = jnp.asarray(rng.integers(0, 255, 1 << 20).astype(np.uint8))
states0 = jnp.full((K,), 1 << 23, jnp.uint32)
N_CALLS = 26


def make_dec(mode):
    lane = jnp.arange(K, dtype=jnp.int32)

    @jax.jit
    def dec(states, ptr, rows_u16):
        def step(carry, xs):
            x, p = carry
            rows, t = xs
            active = t * K + lane < CHUNK
            r = rans._row_i32(rows)
            slot = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
            sym = jnp.sum(r[:, :255] <= slot[:, None], axis=-1) - 1
            if mode in ("redux", "both"):
                le = r <= slot[:, None]
                start = jnp.max(jnp.where(le, r, 0), axis=-1)
                top = jnp.min(jnp.where(le, jnp.int32(1 << 16), r), axis=-1)
            else:
                start = jnp.take_along_axis(r, sym[:, None], axis=-1)[:, 0]
                top = jnp.take_along_axis(
                    r, jnp.minimum(sym + 1, 255)[:, None], axis=-1
                )[:, 0]
                top = jnp.where(sym + 1 == 256, jnp.int32(1 << 16), top)
            freq = (top - start).astype(jnp.uint32)
            x2 = freq * (x >> 16) + slot.astype(jnp.uint32) - start.astype(jnp.uint32)
            cnt = jnp.where(
                active, (x2 < RANS_L).astype(jnp.int32) + (x2 < HALF_L), 0
            )
            offs = jnp.cumsum(cnt) - cnt
            if mode in ("slice", "both"):
                win = jax.lax.dynamic_slice_in_dim(stream, p, 2 * K + 2)
                b0 = jnp.take(win, offs, mode="clip").astype(jnp.uint32)
                b1 = jnp.take(win, offs + 1, mode="clip").astype(jnp.uint32)
            else:
                b0 = jnp.take(stream, p + offs, mode="clip").astype(jnp.uint32)
                b1 = jnp.take(stream, p + offs + 1, mode="clip").astype(jnp.uint32)
            x3 = jnp.where(cnt >= 1, (x2 << 8) | b0, x2)
            x3 = jnp.where(cnt == 2, (x3 << 8) | b1, x3)
            x_new = jnp.where(active, x3, x)
            return (x_new, p + jnp.sum(cnt)), jnp.where(active, sym, 0).astype(jnp.uint8)

        ts = jnp.arange(S, dtype=jnp.int32)
        (states, ptr), syms = jax.lax.scan(
            step, (states, ptr), (rows_u16.reshape(S, K, 256), ts)
        )
        return syms, states, ptr

    return dec


def chain(name, dec, n=N_CALLS):
    st, ptr = states0 + 0, jnp.int32(0)
    syms, st2, p2 = dec(st, ptr, rows16)
    ref = np.asarray(syms)
    t0 = time.time()
    st, ptr = states0 + 0, jnp.int32(0)
    for _ in range(n):
        syms, st, ptr = dec(st, ptr, rows16)
    np.asarray(syms[0, 0])
    wall = time.time() - t0
    per = (wall - 0.025) / n
    print(f"{name:14s} {per*1e3:7.2f} ms/chunk ({CHUNK/per/1e6:6.1f} Msym/s)", flush=True)
    return ref


print(f"backend={jax.default_backend()}", flush=True)
ref = chain("prod", make_dec("prod"))
for m in ("redux", "slice", "both"):
    got = chain(m, make_dec(m))
    print(f"  {m} matches prod: {(got == ref).all()}", flush=True)
