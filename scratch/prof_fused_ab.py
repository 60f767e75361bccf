"""In-process interleaved A/B of the fused Swin kernels on the chip.

Traces p1_full (geo + swin_self + head) under each knob combination in
ONE process (the knobs are read at trace time, so flipping os.environ
between traces yields distinct programs), then measures them round-robin
so tunnel drift hits every arm equally.

    python scratch/prof_fused_ab.py
"""

from __future__ import annotations

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

MODES = {
    "xla": {"SCP_NO_FUSED_MLP": "1", "SCP_NO_FUSED_ATTN": "1"},
    "mlp": {"SCP_NO_FUSED_ATTN": "1"},
    "attn": {"SCP_NO_FUSED_MLP": "1"},
    "both": {},
}


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.models.ehem import EHEM
    from scp_tpu.train.checkpoints import load_params_npz

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    rng = np.random.default_rng(0)
    model = EHEM(dtype=jnp.bfloat16)
    variables = jax.device_put(
        load_params_npz(os.path.join("checkpoints", "ehem_synth_f16.npz"))
    )
    data = np.stack(
        [rng.integers(1, 17, (lanes, n, 4)), rng.integers(1, 9, (lanes, n, 4)),
         rng.integers(0, 255, (lanes, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((lanes, n, 3), dtype=np.float32)
    dd, pd = jax.device_put(data), jax.device_put(pos)

    fns = {}
    for name, env in MODES.items():
        for k in ("SCP_NO_FUSED_MLP", "SCP_NO_FUSED_ATTN"):
            os.environ.pop(k, None)
        os.environ.update(env)
        f = jax.jit(
            lambda v, d, p: model.apply(v, d, p, method=EHEM.decode_phase1)[0][0, 0, 0]
        )
        float(f(variables, dd, pd))  # trace+compile under this env
        fns[name] = f

    reps = int(os.environ.get("REPS", 9))
    ts = {k: [] for k in fns}
    for _ in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            float(f(variables, dd, pd))
            ts[name].append(time.perf_counter() - t0)
    for name, arr in ts.items():
        arr = sorted(arr)
        med = arr[len(arr) // 2]
        print(
            f"p1 {name:5s}: med {med * 1e3:7.2f} ms  "
            f"min {arr[0] * 1e3:7.2f}  ({med / (lanes * n) * 1e6:.3f} us/node)"
        )


if __name__ == "__main__":
    main()
