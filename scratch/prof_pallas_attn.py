"""Chip A/B: swin_self with fused Pallas window attention vs XLA path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
if mode == "xla":
    os.environ["SCP_NO_PALLAS_ATTN"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.models.ehem import EHEM
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

G, CSZ = 8, 8192
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
feat = jax.device_put(rng.random((G, CSZ, 256), np.float32))
d_dev, p_dev = jax.device_put(data), jax.device_put(pos)


def scalar(out):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))


@jax.jit
def swin_fn(v, f):
    return scalar(model.apply(v, f.astype(jnp.bfloat16), method=lambda m, x: m.swin_self(x)))


@jax.jit
def p1_full(v, d, p):
    return scalar(model.apply(v, d, p, method=EHEM.decode_phase1))


def timed(name, fn, *args, n=3):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"[{mode}] {name:16s} {sorted(ts)[len(ts)//2]*1e3:8.1f} ms", flush=True)


timed("swin_self", swin_fn, variables, feat)
timed("phase1 full", p1_full, variables, d_dev, p_dev)
