"""Training-step MFU attribution: where do the FLOPs-per-second go?

Runs the real train step at batch x 8192 and three ablated variants to
attribute the gap between measured MFU and the XLA cost-analysis FLOPs:

  * full         — the real step (fwd + bwd + optax)
  * no_remat     — same without rematerialization (memory for speed)
  * fwd_only     — loss forward only (no grad): the inference-side ceiling
  * frozen_geo   — stop_gradient on the DGCNN features: removes the
                   gather backward (scatter-adds serialize on TPU) from
                   the graph; the delta vs `full` is the gather-bwd cost

    python scratch/prof_train_split.py --batch 8
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from scp_tpu.models.ehem import EHEM

    peak = float(os.environ.get("SCP_TPU_PEAK_FLOPS", 197e12))
    b, n = args.batch, args.context
    rng = np.random.default_rng(0)
    data = np.stack(
        [rng.integers(1, 17, (b, n, 4)), rng.integers(1, 9, (b, n, 4)),
         rng.integers(0, 255, (b, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((b, n, 3), dtype=np.float32)
    label = rng.integers(0, 255, (b, n)).astype(np.int32)
    dd, pd, ld = map(jax.device_put, (data, pos, label))

    def build(remat: bool, frozen_geo: bool):
        model = EHEM(dtype=jnp.bfloat16, remat=remat)
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 16, 4, 3), np.int32),
            np.zeros((1, 16, 3), np.float32),
        )
        params = variables["params"]
        consts = {k: v for k, v in variables.items() if k != "params"}
        tx = optax.adam(1e-4)
        opt = tx.init(params)

        def loss_fn(p, d, po, la):
            if frozen_geo:
                # freeze the geometry trunk's params: the gather backward
                # (scatter-add) disappears from the grad graph
                p = dict(p)
                p["geo"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["geo"]
                )
            logits = model.apply(
                {"params": p, **consts}, d, po, train=False
            )
            ll = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(ll, la[..., None], axis=-1)
            return jnp.mean(nll) / jnp.log(2.0)

        @jax.jit
        def step(p, o, d, po, la):
            loss, g = jax.value_and_grad(loss_fn)(p, d, po, la)
            up, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, up), o2, loss

        @jax.jit
        def fwd(p, d, po, la):
            return loss_fn(p, d, po, la)

        return params, opt, step, fwd

    results = {}
    for tag, remat, frozen, what in [
        ("full", True, False, "step"),
        ("no_remat", False, False, "step"),
        ("frozen_geo", True, True, "step"),
        ("fwd_only", True, False, "fwd"),
    ]:
        params, opt, step, fwd = build(remat, frozen)
        if what == "step":
            lowered = step.lower(params, opt, dd, pd, ld)
            fl = _flops_of(lowered.compile())
            p2, o2, loss = step(params, opt, dd, pd, ld)
            np.asarray(loss)
            t = _med(lambda: np.asarray(step(params, opt, dd, pd, ld)[2]))
        else:
            lowered = fwd.lower(params, dd, pd, ld)
            fl = _flops_of(lowered.compile())
            np.asarray(fwd(params, dd, pd, ld))
            t = _med(lambda: np.asarray(fwd(params, dd, pd, ld)))
        results[tag] = {
            "s": round(t, 4),
            "gflops": round(fl / 1e9, 1),
            "mfu_pct": round(100 * fl / t / peak, 2),
            "tokens_per_s": round(b * n / t, 1),
        }
        print(tag, json.dumps(results[tag]), flush=True)

    print(json.dumps({"batch": b, "context": n, **results}))


if __name__ == "__main__":
    main()
