"""Submodule timing of the p1 trunk with axon-safe single-element fetches.

prof_p1_split.py's block_until_ready timings are meaningless on axon
(async dispatch returns immediately); this harness times every program
the way prof_wavefront.py does — a one-element fetch forces execution.
Each submodule runs as its OWN jit program on freshly uploaded inputs at
the bench shapes (16 lanes x 8192, trained ckpt), so times include one
~24 ms tunnel roundtrip each; the split is the signal, not the sums.

    python scratch/prof_p1_parts.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _med(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.models.ehem import EHEM
    from scp_tpu.ops.knn import knn_indices
    from scp_tpu.train.checkpoints import load_params_npz

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    model = EHEM(dtype=jnp.bfloat16)
    variables = jax.device_put(
        load_params_npz(os.path.join("checkpoints", "ehem_synth_f16.npz"))
    )
    rng = np.random.default_rng(0)
    data = np.stack(
        [rng.integers(1, 17, (lanes, n, 4)), rng.integers(1, 9, (lanes, n, 4)),
         rng.integers(0, 255, (lanes, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((lanes, n, 3), dtype=np.float32)
    dd, pd = jax.device_put(data), jax.device_put(pos)

    def put_bf16(shape):
        return jax.device_put(
            rng.standard_normal(shape).astype(np.float32)
        ).astype(jnp.bfloat16)

    f144 = put_bf16((lanes, n, 144))
    f192 = put_bf16((lanes, n, 192))
    f3 = put_bf16((lanes, n, 3))
    feat = put_bf16((lanes, n, 256))
    states = [put_bf16((lanes, n >> i, 256)) for i in range(5)]

    results = {}

    def bench(tag, fn, *args, fetch=lambda o: o):
        jfn = jax.jit(fn)
        out = jfn(*args)
        np.asarray(fetch(out))  # compile + settle
        np.asarray(fetch(jfn(*args)))
        t = _med(lambda: np.asarray(fetch(jfn(*args))))
        results[tag] = {"s": round(t, 4), "us_per_node": round(t / (lanes * n) * 1e6, 3)}
        print(tag, json.dumps(results[tag]), flush=True)

    first = lambda o: o.ravel()[0]

    bench("knn_c3", lambda f: knn_indices(f, 20), f3, fetch=first)
    bench("knn_c144", lambda f: knn_indices(f, 20), f144, fetch=first)
    bench("knn_c192", lambda f: knn_indices(f, 20), f192, fetch=first)

    def geo_fn(v, d, p):
        flat = d.reshape(lanes, n, -1)[:, :, :-1]
        return model.apply(v, flat, p.astype(jnp.bfloat16), train=False,
                           method=lambda m, f, pq, train: m.geo(f, pq, train=train))

    bench("geo_full", geo_fn, variables, dd, pd, fetch=first)

    def swin_fn(v, f):
        return model.apply(v, f, method=lambda m, x: m.swin_self(x))

    bench("swin_self", swin_fn, variables, feat, fetch=lambda o: o[-1].ravel()[0])

    def tail_fn(v, sts):
        def run(m, s):
            fa = m.ancient_mlp.multiscale(s)
            return m.prob_pred_mlp1(fa[:, ::2]).astype(jnp.float32)
        return model.apply(v, sts, method=run)

    bench("tail(anc+mlp1)", tail_fn, variables, states, fetch=first)

    from scp_tpu.codec.ehem_codec import logits_to_cdf

    logits = jax.device_put(
        rng.standard_normal((lanes * n // 2, 255)).astype(np.float32)
    )
    bench("logits_to_cdf", logits_to_cdf, logits, fetch=first)

    def p1_fn(v, d, p):
        return model.apply(v, d, p.astype(jnp.bfloat16), method=EHEM.decode_phase1)

    bench("p1_full", p1_fn, variables, dd, pd, fetch=lambda o: o[0].ravel()[0])
    print(json.dumps({"lanes": lanes, **results}))


if __name__ == "__main__":
    main()
