"""Op-level profile of the codec phase-1 program on the real chip.

Captures a jax.profiler trace of the p1 forward at bench shapes and
prints the top self-time ops (parsed from the xplane with
tensorboard_plugin_profile), attributing the 1.46 us/node to actual HLO
ops: matmuls vs transposes vs layernorm fusions vs gathers.

    python scratch/prof_p1_trace.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.models.ehem import EHEM

    lanes, n = int(os.environ.get("LANES", 16)), 8192
    model = EHEM(dtype=jnp.bfloat16)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 16, 4, 3), np.int32),
        np.zeros((1, 16, 3), np.float32),
    ))
    rng = np.random.default_rng(0)
    data = np.stack(
        [rng.integers(1, 17, (lanes, n, 4)), rng.integers(1, 9, (lanes, n, 4)),
         rng.integers(0, 255, (lanes, n, 4))], axis=-1,
    ).astype(np.int32)
    pos = rng.random((lanes, n, 3), dtype=np.float32)
    dd, pd = jax.device_put(data), jax.device_put(pos)

    p1 = jax.jit(
        lambda v, d, p: model.apply(
            v, d, p.astype(jnp.bfloat16), method=EHEM.decode_phase1
        )
    )
    jax.block_until_ready(p1(variables, dd, pd))  # compile + warm

    trace_dir = "/tmp/p1_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            jax.block_until_ready(p1(variables, dd, pd))

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data_json, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats^", {"tqx": "out:json;"}
    )
    blob = json.loads(data_json if isinstance(data_json, str) else data_json.decode())
    # gviz table: cols + rows
    cols = [c["label"] for c in blob["table"]["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in blob["table"]["rows"]]
    idx = {c: i for i, c in enumerate(cols)}
    print("\t".join(cols), file=sys.stderr)
    key_t = next(
        (k for k in ("Total self-time (us)", "Avg. self-time (us)",
                     "Total self time (us)") if k in idx), None
    )
    rows.sort(key=lambda r: -(r[idx[key_t]] or 0))
    tot = sum(r[idx[key_t]] or 0 for r in rows)
    print(f"total self time: {tot/1e3:.2f} ms over 3 runs")
    for r in rows[:30]:
        name = r[idx.get("Operation", idx.get("Op name", 0))]
        typ = r[idx["Type"]] if "Type" in idx else ""
        t = r[idx[key_t]] or 0
        print(f"{t/1e3:9.3f} ms  {100*t/tot:5.1f}%  {typ:18s} {str(name)[:80]}")


if __name__ == "__main__":
    main()
