"""Rate certification for the fused train-mode EdgeConv (SCP_FUSED_EDGECONV).

Two 1000-step warm-adapt arms from the committed sknn checkpoint —
identical batches (seed 42, batches are a pure function of step), the
fused knob the ONLY difference — then held-out val bits/node for each.
Recipe matches the round-4 sknn adaptation (0.1x LR, batch 8 x 8192,
static-KNN graph) and the round-5 control receipt in BUILDLOG
(explicit arm: 3.0980 bits/node).

    python scratch/cert_fused_edgeconv.py [--steps 1000]

Runs the arms SEQUENTIALLY in subprocesses (chip probes must be serial;
the knob is read at trace time, so each arm needs a fresh process).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(name: str, fused: bool, steps: int) -> str:
    env = dict(os.environ)
    env["SCP_STATIC_KNN"] = "1"
    env.pop("SCP_FUSED_EDGECONV", None)
    if fused:
        env["SCP_FUSED_EDGECONV"] = "1"
    out = f"/tmp/cert/{name}.npz"
    log = f"/tmp/cert/{name}.log"
    os.makedirs("/tmp/cert", exist_ok=True)
    cmd = [
        sys.executable, "-m", "scp_tpu.tools.train_bench_ckpt",
        "--steps", str(steps), "--batch", "8", "--lr_scale", "0.1",
        "--init_npz", "checkpoints/ehem_synth_f16_sknn.npz",
        "--out", out, "--run_dir", f"/tmp/cert/{name}_run",
    ]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=REPO, env=env, stdout=fh, stderr=fh)
    tail = open(log).read()
    m = re.search(r"final val: ([\d.]+) bits/node", tail)
    val = m.group(1) if m else f"(rc={rc}, no final val — see {log})"
    print(f"[{name}] final val: {val}", flush=True)
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--skip_control", action="store_true",
                    help="reuse the BUILDLOG control receipt (3.0980)")
    args = ap.parse_args()
    fused = run_arm("fused", True, args.steps)
    ctrl = "3.0980 (BUILDLOG receipt)" if args.skip_control else run_arm(
        "explicit", False, args.steps)
    print(f"\nCERT RESULT  fused={fused}  explicit={ctrl}", flush=True)


if __name__ == "__main__":
    main()
