"""Fast end-to-end self-test: synthetic cloud -> encode -> decode -> assert.

    python -m scp_tpu.cli.selftest [--model ehem|octattn] [--points N]

Runs on CPU by default (set SCP_SELFTEST_TPU=1 to use the real chip).
Exercises: preprocessing, octree build, both codec paths, the native range
coder, and the decode-time ground-truth assert.  Exit code 0 == lossless.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    from scp_tpu.utils import enable_compilation_cache, force_cpu

    enable_compilation_cache()
    if not os.environ.get("SCP_SELFTEST_TPU"):
        force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ehem", choices=["ehem", "octattn"])
    ap.add_argument("--points", type=int, default=400)
    ap.add_argument("--system", default="spher", choices=["cart", "spher", "cylin"])
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from scp_tpu import ac
    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.codec.octattn_codec import OctAttentionCodec
    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core import deoctree
    from scp_tpu.core.preprocess import preprocess_points
    from scp_tpu.models.ehem import EHEM
    from scp_tpu.models.octattention import OctAttention

    rng = np.random.default_rng(7)
    n = args.points
    r = rng.uniform(2.0, 60.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.4, 0.2, n)
    pts = np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], 1
    )

    res = preprocess_points(pts, system=args.system, qs=60.0 / 255)
    ctx = res.context
    print(f"cloud: {n} pts -> {ctx.shape[0]} octree nodes, system={args.system}")

    t0 = time.time()
    if args.model == "ehem":
        model = EHEM(
            self_depths=(2, 2), cross_depths=(1,), embed_dim=64, num_heads=2,
            window_size=16, mlp_ratio=2.0, knn_k=4,
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 8, 4, 3), np.int32),
            np.zeros((1, 8, 3), np.float32),
        )
        codec = EHEMCodec(model, variables, context_size=64)
        slices = split_levels(ctx, angular=args.system != "cart")
        stream, bits, _ = codec.encode_to_stream(slices)
        dec = codec.new_stream_decoder(
            stream, codec.ac_symbols_per_node * slices.occ_stream.shape[0]
        )
        codes = codec.decode(
            dec, slices.max_level, np.array(slices.pos_mm, np.int64),
            angular=args.system != "cart", ground_truth=slices.occ_stream,
            level_sizes=slices.level_sizes,
        )
        occ_stream = slices.occ_stream
    else:
        model = OctAttention(
            occ_embed_dim=16, level_embed_dim=4, octant_embed_dim=4,
            abs_pos_embed_dim=8, num_layers=2, num_heads=2, hidden_dim=64,
            context_size=32,
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 32, 4, 3), np.int32),
            np.zeros((1, 32, 4, 3), np.float32),
        )
        codec = OctAttentionCodec(model, variables)
        stream, bits, _ = codec.encode_to_stream(ctx)
        _, occ_stream, max_level = codec.split_levels(ctx)
        dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
        codes = codec.decode(dec, max_level, ground_truth=occ_stream)

    assert (codes == occ_stream).all(), "decode != encode symbols"
    rec_grid = deoctree(codes.astype(np.int64) + 1)
    rec = res.grid.from_grid(rec_grid)
    assert rec.shape == res.recon_points.shape
    print(
        f"LOSSLESS ROUNDTRIP OK  model={args.model} "
        f"bpp={bits / n:.3f} bits/node={bits / len(occ_stream):.3f} "
        f"wall={time.time() - t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
