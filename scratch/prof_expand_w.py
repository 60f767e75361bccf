"""Expand-cost vs buffer width: is _expand_core cost ~linear in width?

The round-5 chain attribution measured the per-level expansion chain at
~0.22 s of the 0.95 s encode wall (and the same again inside decode) —
the #2 cost after the p1 trunk.  Expansion runs at the FULL b_cap width
(131072 rows at bench scale) for every level, but 7 of the 14 expands
have <= 32k real rows.  This harness times the production _expand_core
at power-of-two widths to size the narrow-bucket win before building it.

    python scratch/prof_expand_w.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu.codec import ehem_codec as ec
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(0)
print(f"backend={jax.default_backend()}", flush=True)

LAT = 0.025  # tunnel latency subtracted (BUILDLOG round-4 receipt)


def run(width, n_chain=20):
    data = jnp.asarray(rng.integers(0, 255, (width, 4, 3)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, 1 << 16, (width, 3)).astype(np.int32))
    occ = jnp.asarray(rng.integers(0, 255, width).astype(np.uint8))
    n_par = np.int32(max(width // 8, 1))
    n_child = np.int32(int(width * 0.9))
    lvl, unit = np.int32(12), np.int32(16)

    fn = jax.jit(ec._expand_core)
    o = fn(data, pos, occ, n_par, n_child, lvl, unit)
    np.asarray(o[0][0, 0, 0])
    t0 = time.time()
    for _ in range(n_chain):
        o = fn(data, pos, occ, n_par, n_child, lvl, unit)
    np.asarray(o[0][0, 0, 0])
    wall = (time.time() - t0 - LAT) / n_chain
    print(f"width {width:7d}  {wall * 1e3:7.2f} ms/call", flush=True)
    return wall


if __name__ == "__main__":
    for w in (512, 2048, 8192, 32768, 131072):
        run(w)
