"""Chip A/B of the fused-kernel schedule knobs: SCP_ATTN_BLOCK (windows
per fused-attention grid step) and SCP_MLP_TILE (fused-MLP token tile).

Each config runs in a CHILD process (the knobs are read at trace time, so
in-process sweeps would alias jit caches) and times swin_self and p1_full
at the bench shapes (16 lanes x 8192, trained ckpt) with the axon-safe
single-element-fetch pattern of prof_p1_parts.py.

    python scratch/prof_attn_block.py          # sweep
    CHILD=1 SCP_ATTN_BLOCK=4 python scratch/prof_attn_block.py  # one point
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


def _med(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def child():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scp_tpu.models.ehem import EHEM
    from scp_tpu.train.checkpoints import load_params_npz

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    model = EHEM(dtype=jnp.bfloat16)
    variables = jax.device_put(
        load_params_npz(os.path.join("checkpoints", "ehem_synth_f16.npz"))
    )
    rng = np.random.default_rng(0)
    feat = jax.device_put(
        rng.standard_normal((lanes, n, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    data = np.stack(
        [rng.integers(1, 17, (lanes, n, 4)), rng.integers(1, 9, (lanes, n, 4)),
         rng.integers(0, 255, (lanes, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((lanes, n, 3), dtype=np.float32)
    dd, pd = jax.device_put(data), jax.device_put(pos)

    out = {}

    def swin_fn(v, f):
        return model.apply(v, f, method=lambda m, x: m.swin_self(x))

    jfn = jax.jit(swin_fn)
    np.asarray(jfn(variables, feat)[-1].ravel()[0])
    np.asarray(jfn(variables, feat)[-1].ravel()[0])
    out["swin_self_s"] = round(
        _med(lambda: np.asarray(jfn(variables, feat)[-1].ravel()[0]), n=7), 4
    )
    # p1_full deliberately NOT measured per-config: its geo-trunk compile
    # alone blows the child budget (round-5 finding — the first sweep child
    # hit the 900 s timeout inside p1 compile), and the knobs only touch
    # the Swin sublayers.  The bench re-measures end-to-end after the
    # winning defaults land.
    print("RESULT " + json.dumps(out), flush=True)


def main():
    configs = [
        {"SCP_ATTN_BLOCK": "1", "SCP_MLP_TILE": "512"},   # round-4 shipped
        {"SCP_ATTN_BLOCK": "2", "SCP_MLP_TILE": "512"},
        {"SCP_ATTN_BLOCK": "4", "SCP_MLP_TILE": "512"},
        {"SCP_ATTN_BLOCK": "8", "SCP_MLP_TILE": "512"},
        {"SCP_ATTN_BLOCK": "1", "SCP_MLP_TILE": "1024"},
        {"SCP_ATTN_BLOCK": "1", "SCP_MLP_TILE": "2048"},
        {"SCP_ATTN_BLOCK": "4", "SCP_MLP_TILE": "1024"},
        {"SCP_ATTN_BLOCK": "8", "SCP_MLP_TILE": "1024"},
    ]
    for cfg in configs:
        env = dict(os.environ, CHILD="1", SCP_STATIC_KNN="1", **cfg)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1500,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        tag = f"attn_block={cfg['SCP_ATTN_BLOCK']} mlp_tile={cfg['SCP_MLP_TILE']}"
        if line:
            print(f"{tag}: {line[-1][7:]}  (wall {time.time() - t0:.0f}s)",
                  flush=True)
        else:
            tail = (r.stdout + r.stderr).splitlines()[-6:]
            print(f"{tag}: FAILED rc={r.returncode}\n  " + "\n  ".join(tail),
                  flush=True)


if __name__ == "__main__":
    if os.environ.get("CHILD"):
        child()
    else:
        main()
