"""A/B the fused LN+MLP+residual Pallas kernel on the chip.

Three measurements at the bench shape (16 lanes x 8192, trained ckpt):
  1. MLP sublayer alone, XLA vs fused (chained x6 to amortize latency)
  2. full swin_self encoder, XLA vs fused
  3. p1 full, XLA vs fused

    python scratch/prof_fused_mlp.py
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


def _med(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.models.ehem import EHEM
    from scp_tpu.ops import pallas_mlp
    from scp_tpu.train.checkpoints import load_params_npz

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    rng = np.random.default_rng(0)

    # --- 1. sublayer micro A/B (x6 chained) ---
    m, c, f = lanes * n, 256, 1024
    x = jax.device_put(
        rng.normal(0, 1, (m, c)).astype(np.float32).astype(jnp.bfloat16)
    )
    scale = jax.device_put(np.ones(c, np.float32))
    bias = jax.device_put(np.zeros(c, np.float32))
    w1 = jax.device_put(rng.normal(0, 0.05, (c, f)).astype(jnp.bfloat16))
    b1 = jax.device_put(np.zeros(f, np.float32))
    w2 = jax.device_put(rng.normal(0, 0.05, (f, c)).astype(jnp.bfloat16))
    b2 = jax.device_put(np.zeros(c, np.float32))

    @jax.jit
    def chain_xla(x):
        for _ in range(6):
            x = pallas_mlp._reference(x, scale, bias, w1, b1, w2, b2, 1e-5, "gelu")
        return x[0, 0]

    @jax.jit
    def chain_fused(x):
        for _ in range(6):
            x = pallas_mlp.ln_mlp_residual(x, scale, bias, w1, b1, w2, b2, 1e-5, "gelu")
        return x[0, 0]

    for name, fn in (("xla", chain_xla), ("fused", chain_fused)):
        float(fn(x))  # compile+warm
        t = _med(lambda: float(fn(x)))
        print(f"mlp_sublayer_{name}: {t:.4f}s chained x6 "
              f"-> {(t) / 6 * 1e3:.2f} ms/sublayer (incl latency/6)")

    # --- 2/3. swin_self and p1 through the real model ---
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

    def swin_only(v, d, p):
        flat = d.reshape(lanes, n, -1)[:, :, :-1]
        feat = model.apply(v, flat, p, False, method=lambda m, a, b, t: m.geo(a, b, train=t))
        states = model.apply(v, feat, method=lambda m, s: m.swin_self(s))
        return states[-1][0, 0, 0]

    def p1_full(v, d, p):
        logits1, f1, f2 = model.apply(v, d, p, method=EHEM.decode_phase1)
        return logits1[0, 0, 0]

    swin_fn = jax.jit(swin_only)
    p1_fn = jax.jit(p1_full)
    for name, fn in (("swin_self", swin_fn), ("p1_full", p1_fn)):
        float(fn(variables, dd, pd))
        t = _med(lambda: float(fn(variables, dd, pd)))
        print(f"{name}: {t:.4f}s  ({t / (lanes * n) * 1e6:.3f} us/node)")


if __name__ == "__main__":
    main()
