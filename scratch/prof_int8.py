"""int8 trunk probe (VERDICT r3 task #1: "evaluate an int8 or further-bf16
trunk variant").

Times the Swin sublayer's matmul chain at the codec's shapes in bf16 vs
int8 (dynamic per-row activation quantization + per-column weight scales,
int32 accumulation), chained-dispatch with one single-element fetch.  The
question is whether int8 can buy anything at C=256: the v5e MXU's int8
peak is ~2x bf16, but the trunk measured ~15-20% MFU (latency/HBM-bound),
so the expected answer is NO for matmul time; the probe also reports the
quantization overhead the int8 path would ADD.

    python scratch/prof_int8.py
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


def _chain_med(jfn, args, n_chain=8, n_rep=5):
    """Dispatch n_chain dependent calls, fetch one element once — the only
    honest timing pattern on the axon tunnel (BUILDLOG round 4)."""
    out = jfn(*args)
    np.asarray(out.ravel()[0])  # compile + settle

    def run():
        o = args[0]
        for _ in range(n_chain):
            o = jfn(o, *args[1:])
        np.asarray(o.ravel()[0])

    run()
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / n_chain


def main():
    import jax
    import jax.numpy as jnp

    m, c = 16 * 8192, 256  # one grouped p1 call's token count
    rng = np.random.default_rng(0)
    x32 = rng.standard_normal((m, c)).astype(np.float32)
    w32 = (rng.standard_normal((c, 3 * c)) * 0.05).astype(np.float32)
    x_bf = jax.device_put(x32).astype(jnp.bfloat16)
    w_bf = jax.device_put(w32).astype(jnp.bfloat16)

    results = {}

    # bf16 baseline: y = x @ w, cast back to x's shape for chaining
    def bf16_mm(x, w, wb):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # fold back to (m, c) so calls chain shape-stably
        return (y[:, :c] + y[:, c : 2 * c] + y[:, 2 * c :]).astype(x.dtype)

    jbf = jax.jit(bf16_mm)
    results["bf16_matmul_ms"] = round(
        _chain_med(jbf, (x_bf, w_bf, None)) * 1e3, 3
    )

    # int8: per-row dynamic activation scales, per-column weight scales
    w_i8 = jax.device_put(
        np.clip(np.round(w32 / (np.abs(w32).max(0, keepdims=True) / 127)),
                -127, 127).astype(np.int8)
    )
    w_scale = jax.device_put(
        (np.abs(w32).max(0, keepdims=True) / 127).astype(np.float32)
    )

    def int8_mm(x, wq, ws):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        xs = ax / 127.0
        xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * xs * ws
        return (y[:, :c] + y[:, c : 2 * c] + y[:, 2 * c :]).astype(x.dtype)

    ji8 = jax.jit(int8_mm)
    results["int8_matmul_ms"] = round(
        _chain_med(ji8, (x_bf, w_i8, w_scale)) * 1e3, 3
    )

    # int8 without the dynamic quantization (pre-quantized activations):
    # isolates the MXU win from the quantize overhead
    xq0 = jax.device_put(
        np.clip(np.round(x32 * 4), -127, 127).astype(np.int8)
    )

    def int8_core(xq, wq):
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc[:, :c] + acc[:, c : 2 * c] + acc[:, 2 * c :]
        return jnp.clip(s // 1024, -127, 127).astype(jnp.int8)

    ji8c = jax.jit(int8_core)
    results["int8_core_ms"] = round(
        _chain_med(ji8c, (xq0, w_i8)) * 1e3, 3
    )

    flops = 2 * m * c * 3 * c
    for k in list(results):
        results[k.replace("_ms", "_tflops")] = round(
            flops / (results[k] / 1e3) / 1e12, 1
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
