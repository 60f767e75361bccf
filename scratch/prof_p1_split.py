"""Attribute the codec phase-1 program's on-chip time to its modules.

p1 = geo trunk -> swin_self (5 stages) -> ancient_mlp -> mlp1 head
(+ logits_to_cdf).  Times each piece as its own jitted program at the
bench shapes (16 lanes x 8192), plus the composed p1, on the real chip.
Sub-program times don't sum exactly to the fused program (XLA fuses
across module boundaries) but the ranking attributes where the
1.46 us/node goes.

    python scratch/prof_p1_split.py
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
    from scp_tpu.models.swin1d import concat_multiscale

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    peak = float(os.environ.get("SCP_TPU_PEAK_FLOPS", 197e12))

    model = EHEM(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 4, 3), np.int32),
        np.zeros((1, 16, 3), np.float32),
    )
    variables = jax.device_put(variables)
    rng = np.random.default_rng(0)
    data = np.stack(
        [rng.integers(1, 17, (lanes, n, 4)), rng.integers(1, 9, (lanes, n, 4)),
         rng.integers(0, 255, (lanes, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((lanes, n, 3), dtype=np.float32)
    dd, pd = jax.device_put(data), jax.device_put(pos)

    feat = jax.device_put(
        rng.standard_normal((lanes, n, 256)).astype(np.float32).astype(jnp.bfloat16)
    )

    def geo_fn(v, d, p):
        flat = d.reshape(lanes, n, -1)[:, :, :-1]
        return model.apply(v, flat, p.astype(jnp.bfloat16), train=False,
                           method=lambda m, f, pq, train: m.geo(f, pq, train=train))

    def swin_fn(v, f):
        return model.apply(v, f, method=lambda m, x: m.swin_self(x))

    def tail_fn(v, states):
        def run(m, sts):
            fa = m.ancient_mlp(concat_multiscale(sts))
            return m.prob_pred_mlp1(fa[:, ::2]).astype(jnp.float32)
        return model.apply(v, states, method=run)

    def p1_fn(v, d, p):
        return model.apply(v, d, p.astype(jnp.bfloat16), method=EHEM.decode_phase1)

    results = {}

    def bench(tag, fn, *args):
        jfn = jax.jit(fn)
        comp = jfn.lower(variables, *args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        out = jfn(variables, *args)
        jax.block_until_ready(out)
        t = _med(lambda: jax.block_until_ready(jfn(variables, *args)))
        results[tag] = {
            "s": round(t, 4),
            "gflops": round(fl / 1e9, 1),
            "mfu_pct": round(100 * fl / t / peak, 2),
            "us_per_node": round(t / (lanes * n) * 1e6, 3),
        }
        print(tag, json.dumps(results[tag]), flush=True)
        return out

    bench("geo", geo_fn, dd, pd)
    states = bench("swin_self", swin_fn, feat)
    bench("tail(anc+mlp1)", tail_fn, states)
    bench("p1_full", p1_fn, dd, pd)
    print(json.dumps({"lanes": lanes, **results}))


if __name__ == "__main__":
    main()
