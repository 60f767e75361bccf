"""Device-resident component timing: geo vs swin vs phase2 vs rANS chunks."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import rans
from scp_tpu.models.ehem import EHEM
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

G, CSZ = (int(sys.argv[1]) if len(sys.argv) > 1 else 8), 8192

model = EHEM(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
data = np.stack(
    [
        rng.integers(0, 17, (G, CSZ, 4)),
        rng.integers(0, 9, (G, CSZ, 4)),
        rng.integers(0, 255, (G, CSZ, 4)),
    ],
    axis=-1,
).astype(np.int32)
pos = rng.random((G, CSZ, 3), dtype=np.float32)
variables = jax.device_put(model.init(jax.random.PRNGKey(0), data[:1, :16], pos[:1, :16]))


def scalar(out):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    try:
        fl = fn.lower(*args).compile().cost_analysis()
        if isinstance(fl, list):
            fl = fl[0]
        flops = float(fl.get("flops", 0.0))
    except Exception:
        flops = 0.0
    mfu = 100 * flops / max(med, 1e-9) / 197e12
    print(f"{name:20s} {med*1e3:8.1f} ms  {flops/1e9:8.1f} GF  MFU {mfu:5.2f}%", flush=True)
    return med


d_dev = jax.device_put(data)
p_dev = jax.device_put(pos)
flat_dev = jax.device_put(data.reshape(G, CSZ, -1)[:, :, :-1])
feat_dev = jax.device_put(rng.random((G, CSZ, 256), np.float32).astype(np.float32))
f1_dev = jax.device_put(rng.random((G, CSZ // 2, 256), np.float32))
f2_dev = jax.device_put(rng.random((G, CSZ // 2, 256), np.float32))
occ_dev = jax.device_put(rng.integers(0, 255, (G, CSZ // 2)).astype(np.int32))


@jax.jit
def geo_fn(v, flat, pos):
    return scalar(model.apply(v, flat, pos, train=False,
                              method=lambda m, f, p, train: m.geo(f, p, train=train)))


@jax.jit
def swin_fn(v, f):
    return scalar(model.apply(v, f.astype(jnp.bfloat16),
                              method=lambda m, x: m.swin_self(x)))


@jax.jit
def p1_full(v, d, p):
    return scalar(model.apply(v, d, p, method=EHEM.decode_phase1))


@jax.jit
def p2_fn(v, a, b2, o):
    return scalar(model.apply(v, a, b2, o, False, method=EHEM.decode_phase2))


timed("geo (dgcnn)", geo_fn, variables, flat_dev, p_dev)
timed("swin_self", swin_fn, variables, feat_dev)
timed("phase1 full", p1_full, variables, d_dev, p_dev)
timed("phase2 (cross)", p2_fn, variables, f1_dev, f2_dev, occ_dev)

# rANS chunk throughput (decode + encode), device-resident
rows = jax.device_put(
    np.tile(
        np.asarray(
            __import__("scp_tpu.codec.ehem_codec", fromlist=["logits_to_cdf"]).logits_to_cdf(
                jnp.asarray(rng.normal(0, 3, (rans.CHUNK, 255)).astype(np.float32))
            )
        ),
        (1, 1),
    )
)
syms = jax.device_put(rng.integers(0, 255, rans.CHUNK).astype(np.int32))
sf = rans.gather_start_freq(rows, syms)


@jax.jit
def enc_chunk_fn(states, sf):
    return rans._encode_chunk(states, sf, jnp.int32(0), jnp.int32(rans.CHUNK))


states0 = jnp.full((rans.K_LANES,), rans.RANS_L, jnp.uint32)


def enc_once():
    buf, tot, st = rans._encode_chunk(
        jnp.full((rans.K_LANES,), rans.RANS_L, jnp.uint32), sf,
        jnp.int32(0), jnp.int32(rans.CHUNK))
    np.asarray(tot)


np.asarray(rans._encode_chunk(states0, sf, jnp.int32(0), jnp.int32(rans.CHUNK))[1])
ts = []
for _ in range(3):
    t0 = time.time()
    enc_once()
    ts.append(time.time() - t0)
print(f"rans enc chunk (16384 syms): {sorted(ts)[1]*1e3:.1f} ms", flush=True)

enc = rans.RansEncoder()
enc.append_group(sf, rans.CHUNK)
payload = enc.finish()
dec = rans.RansDecoder(payload)
rows16 = rows.astype(jnp.uint16)
t0 = time.time()
out = dec.decode_group(rows16, rans.CHUNK)
got = np.asarray(out)
t1 = time.time() - t0
assert (got[: rans.CHUNK] == np.asarray(syms)).all(), "rans chip roundtrip FAILED"
print(f"rans dec chunk (16384 syms, incl 1 fetch): {t1*1e3:.1f} ms  ROUNDTRIP OK", flush=True)
