"""On-chip OctAttention incremental codec benchmark.

Encodes + decodes a >=100k-node synthetic cloud with the batched
incremental (KV-cache) engine: one dispatch per node-POSITION over all
chunks of a level, not per node (the reference's sequential decoder is
one full 1024-window forward PER NODE, decode.py:73-107).

    python -m scp_tpu.tools.bench_octattn [n_points]

Measured (1x TPU v5e, full-size model, untrained weights — throughput
is weight-independent): 112,186 nodes decode losslessly in 260 s
(431 nodes/s); encode via the same engine 259 s.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from scp_tpu import ac
from scp_tpu.codec.octattn_codec import OctAttentionCodec
from scp_tpu.core.preprocess import kitti_qs, preprocess_points
from scp_tpu.models.octattention import OctAttention
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
LEVEL = 12


from scp_tpu.tools.train_bench_ckpt import synth_kitti  # single source

rng = np.random.default_rng(0)
pts = synth_kitti(rng, N_POINTS)
res = preprocess_points(pts, system="spher", qs=kitti_qs(LEVEL))
ctx = res.context
print(f"{N_POINTS} pts -> {ctx.shape[0]} nodes at L{LEVEL}", flush=True)

model = OctAttention(dtype=jnp.bfloat16)  # full-size: 600-d token, ctx 1024
variables = model.init(
    jax.random.PRNGKey(0),
    np.zeros((1, 16, 4, 3), np.int32),
    np.zeros((1, 16, 4, 3), np.float32),
)
codec = OctAttentionCodec(model, variables)

t0 = time.time()
rows, syms, t_model = codec.encode_incremental(ctx)
enc = ac.StreamingEncoder()
enc.append_quantized(rows, syms)
stream, bits = enc.finish()
t_enc = time.time() - t0
print(f"warm+encode: {t_enc:.1f}s  bits/node={bits/ctx.shape[0]:.2f}", flush=True)

_, occ_stream, max_level = codec.split_levels(ctx)
dec = ac.ArithmeticDecoder(stream, occ_stream.shape[0])
t0 = time.time()
codes = codec.decode_incremental(dec, max_level, ground_truth=occ_stream)
t_dec = time.time() - t0
assert (codes == occ_stream).all()
n = ctx.shape[0]
print(f"DECODE OK: {t_dec:.1f}s for {n} nodes "
      f"({n/t_dec:.0f} nodes/s, {N_POINTS/(t_enc+t_dec):.0f} pts/s enc+dec)",
      flush=True)

# steady-state encode (second pass, compiles cached)
t0 = time.time()
rows, syms, _ = codec.encode_incremental(ctx)
print(f"steady encode: {time.time()-t0:.1f}s", flush=True)
