"""Per-program device-time breakdown of the device-resident wavefront.

Answers round-3's central perf question: with the host off the critical
path, where do the ~2.4s/direction go, and does a larger lane group buy
MXU utilization?  Run on the live chip:

    python scratch/prof_wavefront.py --groups 4,8,16,32
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


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _med(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="8,16")
    ap.add_argument("--width", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.codec import rans
    from scp_tpu.models.ehem import EHEM
    from scp_tpu.train.checkpoints import load_params_npz

    peak = float(os.environ.get("SCP_TPU_PEAK_FLOPS", 197e12))
    model = EHEM(dtype=jnp.bfloat16)
    variables = load_params_npz(
        os.path.join("checkpoints", "ehem_synth_f16.npz")
    )
    w = args.width

    for g in [int(x) for x in args.groups.split(",")]:
        codec = EHEMCodec(model, variables, context_size=w, group_size=g)
        cap = g * w
        db = codec._replicate_or_put(np.zeros((cap, 4, 3), np.int32))
        pb = codec._replicate_or_put(np.zeros((cap, 3), np.int32))
        occ = codec._replicate_or_put(np.zeros(cap + rans.CHUNK, np.uint8))
        a = (
            codec.variables, db, pb, np.int32(0), np.int32(2**31 - 1),
            np.int32(0), np.float32(1.0), g, w,
        )
        lowered = jax.jit(
            codec._p1_buf_fn.__wrapped__
            if hasattr(codec._p1_buf_fn, "__wrapped__")
            else codec._p1_buf_fn,
            static_argnums=(7, 8),
        ).lower(*a)
        f_p1 = _flops_of(lowered.compile())
        rows1, f1, f2 = codec._p1_buf_fn(*a)
        np.asarray(rows1[0, 0])
        t_p1 = _med(lambda: np.asarray(codec._p1_buf_fn(*a)[0][0, 0]))

        evens, odds = codec._syms_fn(occ, np.int32(0), np.int32(cap), g, w)
        f_p2 = _flops_of(
            jax.jit(
                codec._p2_buf_fn.__wrapped__
                if hasattr(codec._p2_buf_fn, "__wrapped__")
                else codec._p2_buf_fn
            ).lower(codec.variables, f1, f2, evens).compile()
        )
        r2 = codec._p2_buf_fn(codec.variables, f1, f2, evens)
        np.asarray(r2[0, 0])
        t_p2 = _med(
            lambda: np.asarray(
                codec._p2_buf_fn(codec.variables, f1, f2, evens)[0, 0]
            )
        )

        # rans decode of one level's evens (ne = cap//2 rows)
        ne = cap // 2
        npad = rans.pad_to_chunk(ne)
        uni = codec._uniform_rows()
        rows_e = jnp.broadcast_to(uni[:1], (npad, 256)) + 0
        enc = rans.RansEncoder()
        sf = rans.gather_start_freq(rows_e, jnp.zeros((npad,), jnp.int32))
        enc.append_group(sf, ne)
        stream = enc.finish()

        def rans_once():
            dec = rans.RansDecoder(stream)
            np.asarray(dec.decode_group(rows_e.astype(jnp.uint16), ne)[0])

        rans_once()
        t_rans = _med(rans_once)

        nodes = cap
        print(
            json.dumps(
                {
                    "group": g,
                    "width": w,
                    "nodes": nodes,
                    "p1_s": round(t_p1, 4),
                    "p1_gflops": round(f_p1 / 1e9, 1),
                    "p1_mfu_pct": round(100 * f_p1 / t_p1 / peak, 2),
                    "p2_s": round(t_p2, 4),
                    "p2_gflops": round(f_p2 / 1e9, 1),
                    "p2_mfu_pct": round(100 * f_p2 / t_p2 / peak, 2),
                    "rans_evens_s": round(t_rans, 4),
                    "per_mnode_p1p2_s": round((t_p1 + t_p2) / nodes * 1e6, 3),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
