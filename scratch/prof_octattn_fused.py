"""Chip A/B of the fused-level OctAttention incremental engine (VERDICT r4
task #6: halve the 129 s/scan L12 incremental decode).

Builds the protocol L12 spherical scan (same synth distribution as the
sweeps), loads the committed v2 checkpoint, and runs the device-rANS
incremental encode+decode with the ground-truth assert on — fused
(one dispatch per level) vs per-position (SCP_OCTATTN_FUSED=0) schedule.
Each schedule runs in a CHILD process (the knob is read at codec
construction and the two schedules' programs must not share jit caches).

    python scratch/prof_octattn_fused.py            # both schedules
    CHILD=1 python scratch/prof_octattn_fused.py    # one point
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def child():
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from scp_tpu.codec import octattn_rans as orans
    from scp_tpu.codec.octattn_codec import OctAttentionCodec
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.models.octattention import OctAttention
    from scp_tpu.tools.train_bench_ckpt import synth_kitti
    from scp_tpu.train.checkpoints import load_params_npz

    rng = np.random.default_rng(0)
    pts = synth_kitti(rng, 120_000)
    res = preprocess_points(pts, system="spher", qs=kitti_qs(12))
    ctx = res.context

    model = OctAttention()
    variables = load_params_npz("checkpoints/octattn_synth_l12_v2.npz")
    codec = OctAttentionCodec(model, variables, mode="rans")
    _, occ_stream, max_level = codec.split_levels(ctx)
    out = {
        "fused": bool(codec.fused),
        "nodes": int(occ_stream.shape[0]),
        "max_level": int(max_level),
    }

    def run_once():
        t0 = time.time()
        enc = orans.OctRansEncoder(codec.max_lane_bucket(ctx))
        codec.encode_incremental_into(enc, ctx)
        payload = enc.finish()
        t_enc = time.time() - t0
        t0 = time.time()
        dec = orans.OctRansDecoder(payload)
        codes = codec.decode_incremental_rans(
            dec, max_level, ground_truth=occ_stream
        )
        t_dec = time.time() - t0
        assert (codes == occ_stream).all()
        return t_enc, t_dec, len(payload)

    t0 = time.time()
    e0, d0, nbytes = run_once()  # warm (compiles)
    out["warm_wall_s"] = round(time.time() - t0, 1)
    passes = [run_once() for _ in range(2 if codec.fused else 1)]
    best = min(passes, key=lambda p: p[0] + p[1])
    out.update(
        enc_s=round(best[0], 2), dec_s=round(best[1], 2),
        bpp=round(nbytes * 8 / 120_000, 3),
        nodes_per_s_dec=round(out["nodes"] / best[1], 0),
    )
    print("RESULT " + json.dumps(out), flush=True)


def main():
    for fused in ("1", "0"):
        env = dict(os.environ, CHILD="1", SCP_OCTATTN_FUSED=fused)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=3000,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if line:
            print(f"fused={fused}: {line[-1][7:]}  "
                  f"(wall {time.time() - t0:.0f}s)", flush=True)
        else:
            tail = (r.stdout + r.stderr).splitlines()[-8:]
            print(f"fused={fused}: FAILED rc={r.returncode}\n  "
                  + "\n  ".join(tail), flush=True)


if __name__ == "__main__":
    if os.environ.get("CHILD"):
        child()
    else:
        main()
