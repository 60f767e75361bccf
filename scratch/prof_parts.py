"""Per-component device-compute timing of the EHEM phases on chip.

Every jitted program reduces its outputs to ONE scalar so the fetch is
4 bytes — isolating device compute + dispatch latency from tunnel
transfer. Run: python scratch/prof_parts.py [group]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.models.ehem import EHEM
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

G = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CSZ = 8192

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
variables = model.init(jax.random.PRNGKey(0), data[:1, :16], pos[:1, :16])
variables = jax.device_put(variables)


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
    print(f"{name:18s} {med*1e3:8.1f} ms  {flops/1e9:8.1f} GF  MFU {mfu:5.2f}%", flush=True)
    return med


flat = data.reshape(G, CSZ, -1)[:, :, :-1]


@jax.jit
def knn_only(pos):
    from scp_tpu.ops.knn import knn_indices
    return scalar(knn_indices(pos.astype(jnp.bfloat16), 20))


@jax.jit
def geo_fn(v, flat, pos):
    return scalar(model.apply(v, flat, pos, train=False, method=lambda m, f, p, train: m.geo(f, p, train=train)))


@jax.jit
def p1_full(v, d, p):
    return scalar(model.apply(v, d, p, method=EHEM.decode_phase1))


feat = rng.random((G, CSZ, 256), dtype=np.float32)


@jax.jit
def swin_fn(v, f):
    return scalar(model.apply(v, f.astype(jnp.bfloat16), method=lambda m, x: m.swin_self(x)))


f1 = rng.random((G, CSZ // 2, 256), dtype=np.float32)
f2 = rng.random((G, CSZ // 2, 256), dtype=np.float32)
occ = rng.integers(0, 255, (G, CSZ // 2)).astype(np.int32)


@jax.jit
def p2_fn(v, a, b2, o):
    return scalar(model.apply(v, a, b2, o, False, method=EHEM.decode_phase2))


timed("knn(pos) x1", knn_only, pos)
timed("geo (dgcnn)", geo_fn, variables, flat, pos)
timed("swin_self", swin_fn, variables, feat)
timed("phase1 full", p1_full, variables, data, pos)
timed("phase2 (cross)", p2_fn, variables, f1, f2, occ)
