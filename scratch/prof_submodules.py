"""Per-submodule device-time breakdown of the EHEM phase-1 trunk.

WARNING — numbers from this harness proved UNRELIABLE on the axon
backend: feeding one jit's output array into a second jit and timing the
second call measured ~9x the end-to-end fused program (swin "1.2 s"
inside a p1 that measures 0.146 s total), consistent with the lazy
buffer graph re-running upstream programs on each fetch.  Trust
prof_wavefront.py (fused programs, single-element fetches) and the
end-to-end bench instead.  Kept for the record.

    python scratch/prof_submodules.py --group 16
"""

from __future__ import annotations

import argparse
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


def _med(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scp_tpu.models.ehem import EHEM
    from scp_tpu.models.swin1d import concat_multiscale
    from scp_tpu.train.checkpoints import load_params_npz

    model = EHEM(dtype=jnp.bfloat16)
    variables = load_params_npz(
        os.path.join("checkpoints", "ehem_synth_f16.npz")
    )
    g, n = args.group, 8192
    rng = np.random.default_rng(0)
    data = np.stack(
        [
            rng.integers(1, 17, (g, n, 4)),
            rng.integers(1, 9, (g, n, 4)),
            rng.integers(0, 255, (g, n, 4)),
        ],
        axis=-1,
    ).astype(np.int32)
    pos = rng.random((g, n, 3), dtype=np.float32)
    data_d = jax.device_put(data)
    pos_d = jax.device_put(pos)

    def geo_fn(v, d, p):
        flat = d.reshape(g, n, -1)[:, :, :-1]
        return model.apply(
            v, flat, p, train=False,
            method=lambda m, f, p, train: m.geo(f, p, train=train),
        )

    def swin_fn(v, feat):
        return model.apply(
            v, feat, method=lambda m, f: m.swin_self(f)
        )

    def head_fn(v, states):
        def run(m, sts):
            fa = m.ancient_mlp(concat_multiscale(sts))
            l1 = m.prob_pred_mlp1(fa[:, ::2]).astype(jnp.float32)
            return l1
        return model.apply(v, states, method=run)

    geo_j = jax.jit(geo_fn)
    feat = geo_j(variables, data_d, pos_d)
    np.asarray(feat[0, 0, 0])
    t_geo = _med(lambda: np.asarray(geo_j(variables, data_d, pos_d)[0, 0, 0]))

    swin_j = jax.jit(swin_fn)
    states = swin_j(variables, feat)
    np.asarray(states[-1][0, 0, 0])
    t_swin = _med(lambda: np.asarray(swin_j(variables, feat)[-1][0, 0, 0]))

    head_j = jax.jit(head_fn)
    l1 = head_j(variables, states)
    np.asarray(l1[0, 0, 0])
    t_head = _med(lambda: np.asarray(head_j(variables, states)[0, 0, 0]))

    # full phase 1 for reference (trunk + logits1 + logits_to_cdf)
    def p1_fn(v, d, p):
        return model.apply(v, d, p, method=EHEM.decode_phase1)

    p1_j = jax.jit(p1_fn)
    out = p1_j(variables, data_d, pos_d)
    np.asarray(out[0][0, 0, 0] if isinstance(out, tuple) else out[0, 0, 0])
    t_p1 = _med(
        lambda: np.asarray(p1_j(variables, data_d, pos_d)[0][0, 0, 0])
    )

    nodes = g * n
    print(
        json.dumps(
            {
                "group": g,
                "nodes": nodes,
                "geo_s": round(t_geo, 4),
                "swin_self_s": round(t_swin, 4),
                "heads_s": round(t_head, 4),
                "p1_full_s": round(t_p1, 4),
                "sum_parts_s": round(t_geo + t_swin + t_head, 4),
                "geo_us_per_node": round(t_geo / nodes * 1e6, 3),
                "swin_us_per_node": round(t_swin / nodes * 1e6, 3),
                "heads_us_per_node": round(t_head / nodes * 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
