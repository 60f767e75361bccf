"""Fresh-buffer download bandwidth + KNN chunk variants."""
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


@partial(jax.jit, static_argnums=0)
def make(n, seed):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n,), jnp.float32)


np.asarray(make(16, 0))
for mb in (1, 4, 16):
    n = mb * 1024 * 1024 // 4
    np.asarray(make(n, 1))  # compile for this shape
    t0 = time.time()
    np.asarray(make(n, 2))  # fresh content -> real download
    print(f"compute+download fresh {mb}MB: {(time.time()-t0)*1e3:.1f} ms", flush=True)

from scp_tpu.ops import knn as knn_mod

feats = np.random.default_rng(0).random((8, 8192, 192), np.float32)
feats_dev = jax.device_put(feats)


def time_knn(chunk, note=""):
    knn_mod._KNN_CHUNK = chunk

    @jax.jit
    def f(x):
        idx = knn_mod.knn_indices(x.astype(jnp.bfloat16), 20)
        return jnp.sum(idx.astype(jnp.float32))

    np.asarray(f(feats_dev))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(feats_dev))
        ts.append(time.time() - t0)
    print(f"knn chunk={chunk:5d} {note}: {sorted(ts)[1]*1e3:.1f} ms", flush=True)


time_knn(1024, "(current)")
time_knn(2048)
time_knn(4096)
time_knn(8192, "(no map)")

# exact top_k for comparison at best chunk
os.environ["SCP_EXACT_KNN"] = "1"
time_knn(4096, "(exact top_k)")
del os.environ["SCP_EXACT_KNN"]

# the full geo stack at best chunk vs current
from scp_tpu.models.ehem import EHEM

model = EHEM(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
G, CSZ = 8, 8192
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
data_dev, pos_dev = jax.device_put(data), jax.device_put(pos)


def time_p1(chunk):
    knn_mod._KNN_CHUNK = chunk

    @jax.jit
    def f(v, d, p):
        out = model.apply(v, d, p, method=EHEM.decode_phase1)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))

    np.asarray(f(variables, data_dev, pos_dev))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(variables, data_dev, pos_dev))
        ts.append(time.time() - t0)
    print(f"phase1 knn_chunk={chunk}: {sorted(ts)[1]*1e3:.1f} ms", flush=True)


time_p1(1024)
time_p1(4096)
time_p1(8192)
