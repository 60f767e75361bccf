"""Seed the persistent XLA compilation cache for production codec runs.

Every (lanes, width) phase program, rANS chunk program, and expansion/
emit shape class compiles on first use — over a remote-TPU link that is
real minutes of wall clock (BENCH_r03 measured 676 s for one cloud-size
class).  This tool runs the codec's own warmup (one full encode+decode
roundtrip per requested size class) so the programs land in
JAX_COMPILATION_CACHE_DIR; any LATER process that runs the same code
version on the same size class warms from the cache in seconds.

    python -m scp_tpu.tools.precompile --points 120000 --levels 16 \
        --system spher [--ckpt checkpoints/ehem_synth_f16.npz]

Multiple size classes: repeat --points/--levels pairs
(`--points 120000 60000 --levels 16 14`).  Prints per-class seed time
and a second-pass warm time measured in THIS process (the cross-process
warm check is `bench.py` itself — its warmup line reports the cached
time).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, nargs="+", default=[120_000])
    ap.add_argument("--levels", type=int, nargs="+", default=[16])
    ap.add_argument("--system", default="spher", choices=["spher", "cylin", "cart"])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--context", type=int, default=8192)
    args = ap.parse_args(argv)
    if len(args.levels) == 1 and len(args.points) > 1:
        args.levels = args.levels * len(args.points)
    assert len(args.points) == len(args.levels)

    # Mirror bench.py's production defaults EXACTLY — the compiled program
    # set depends on the trunk graph mode (SCP_STATIC_KNN changes the
    # traced graph), so seeding with a different knob default would warm
    # the wrong programs and the driver bench would pay a cold compile.
    if args.ckpt is None:
        sknn = "checkpoints/ehem_synth_f16_sknn.npz"
        if os.environ.get("SCP_STATIC_KNN", "1") != "0" and os.path.exists(sknn):
            os.environ["SCP_STATIC_KNN"] = "1"
            args.ckpt = sknn
        else:
            args.ckpt = "checkpoints/ehem_synth_f16.npz"

    import jax
    import jax.numpy as jnp

    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.models.ehem import EHEM
    from scp_tpu.tools.train_bench_ckpt import synth_kitti
    from scp_tpu.train.checkpoints import load_params_npz

    model = EHEM(dtype=jnp.bfloat16)
    if os.path.exists(args.ckpt):
        variables = load_params_npz(args.ckpt)
    else:
        print(f"# {args.ckpt} missing; random init (programs are "
              "shape-keyed, so the cache is still valid)", file=sys.stderr)
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 16, 4, 3), np.int32),
            np.zeros((1, 16, 3), np.float32),
        )
    codec = EHEMCodec(model, variables, context_size=args.context)

    rng = np.random.default_rng(0)
    angular = args.system in ("spher", "cylin")
    for pts_n, lvl in zip(args.points, args.levels):
        cloud = synth_kitti(rng, pts_n)
        res = preprocess_points(cloud, system=args.system, qs=kitti_qs(lvl))
        slices = split_levels(res.context, angular=angular)
        t0 = time.time()
        n_shapes = codec.warmup(slices)
        t_seed = time.time() - t0
        t0 = time.time()
        codec.warmup(slices)
        t_warm = time.time() - t0
        print(
            f"class points={pts_n} L{lvl} {args.system}: "
            f"{n_shapes} phase shapes, seed {t_seed:.1f}s, "
            f"re-warm {t_warm:.1f}s "
            f"(cache: {os.environ['JAX_COMPILATION_CACHE_DIR']})"
        )


if __name__ == "__main__":
    main()
