"""Device-time attribution of the bench encode/decode chains by ablation.

The bench wall is one serialized device chain (`finish_chain` /
`fetch_out`); per-dispatch host timers can't split it.  This harness
re-runs the SAME cached programs the codec dispatches, in the same level
order, but truncated after successive stages; consecutive deltas give the
per-stage device time at the real bench scale (120k-pt synthetic KITTI,
L16, 843k nodes):

  enc: expand -> +p1 -> +syms/sf(evens) -> +p2/sf(odds) -> full(+rANS enc)
  dec: oracle (rANS decode scans replaced by ground-truth symbol reads)
       vs full: the delta is the rANS decode-scan cost.

Each variant dispatches everything, then forces ONE tail fetch through a
tiny combine program depending on every kept array (single-stream TPU
executes in dispatch order, so one fetch bounds the whole chain).

    python scratch/prof_chain_parts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# env vars are IGNORED by the axon sitecustomize — must jax.config.update
# (BUILDLOG round 4, commit fafe398)
from scp_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scp_tpu.codec import rans
    from scp_tpu.codec.ehem_codec import EHEMCodec, _cat_pad_dev
    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.models.ehem import EHEM
    from scp_tpu.train.checkpoints import load_params_npz

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synth_kitti

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    n_pts = int(os.environ.get("PROF_PTS", "120000"))
    lvl = int(os.environ.get("PROF_LEVEL", "16"))
    pts = synth_kitti(rng, n_pts)
    res = preprocess_points(pts, system="spher", qs=kitti_qs(lvl))
    slices = split_levels(res.context, angular=True)

    os.environ.setdefault("SCP_STATIC_KNN", "1")
    model = EHEM(dtype=jnp.bfloat16)
    variables = load_params_npz(
        os.path.join(here, "checkpoints", "ehem_synth_f16_sknn.npz")
    )
    codec = EHEMCodec(model, variables, context_size=8192)
    codec.warmup(slices)

    from scp_tpu.codec.ehem_codec import _expand_stream, _expand_width, _pow2

    sizes = slices.level_sizes
    max_level = slices.max_level
    plans, b_cap, e_cap = codec._plan_levels(sizes)
    total = sum(sizes)
    n_cap = _pow2(total + max(b_cap, rans.CHUNK))
    occ_host = np.zeros(n_cap, np.uint8)
    occ_host[:total] = slices.occ_stream.astype(np.uint8)

    @jax.jit
    def combine(parts):
        return sum(p.ravel()[-1].astype(jnp.float32) for p in parts)

    def run_variant(stage: str) -> float:
        """stage in {expand, p1, p1sf, p2, full}; returns wall seconds."""
        if stage == "full":
            t0 = time.time()
            codec.encode_to_stream(slices)
            return time.time() - t0

        t0 = time.time()
        occ_dev = codec._replicate_or_put(occ_host)
        data_buf, pos_buf = codec._root_bufs(b_cap)
        keep = []
        off = 0
        for li, n in enumerate(sizes):
            level = li + 1
            clip = codec._clip_for(level, max_level, None)
            lo, scale = codec._norm_params(
                slices.pos_mm[li] if slices.angular else (0, 0),
                max_level, slices.angular,
            )
            if n <= codec.TINY_UNIFORM_MAX:
                if stage in ("p1sf", "p2"):
                    keep.append(
                        codec._sf_uniform_fn(
                            codec._uniform_rows(), occ_dev,
                            np.int32(off), np.int32(n),
                        )
                    )
            else:
                calls, _ = plans[li]
                for s, lanes, width in calls:
                    if stage == "expand":
                        break
                    rows1, f1, f2 = codec._p1_buf_fn(
                        codec.variables, data_buf, pos_buf,
                        np.int32(s), clip, lo, scale, lanes, width,
                    )
                    if stage == "p1":
                        keep.append(rows1)
                        continue
                    evens, odds = codec._syms_fn(
                        occ_dev, np.int32(off + s), np.int32(off + n),
                        lanes, width,
                    )
                    keep.append(codec._sf_flat_fn(rows1, evens))
                    if stage == "p1sf":
                        continue
                    rows2 = codec._p2_buf_fn(codec.variables, f1, f2, evens)
                    keep.append(codec._sf_flat_fn(rows2, odds))
            if level < max_level:
                unit = np.int32(1 << (max_level - (level + 1) + 1))
                data_buf, pos_buf = _expand_stream(
                    data_buf, pos_buf, occ_dev, np.int32(off),
                    np.int32(n), np.int32(sizes[li + 1]),
                    np.int32(level + 1), unit,
                    _expand_width(plans, b_cap, li, sizes),
                )
            off += n
        keep.append(data_buf)
        np.asarray(combine(tuple(keep)))
        return time.time() - t0

    def run_dec(oracle: bool) -> float:
        stream, _, _ = codec.encode_to_stream(slices)
        dec = codec.new_stream_decoder(
            stream, codec.ac_symbols_per_node * total
        )
        if oracle:
            # Pre-stage every decode_group answer on device BEFORE timing:
            # the true per-level evens/odds/flat symbols, padded to the
            # exact (pad_to_chunk) width the real decoder would return.
            occ = slices.occ_stream.astype(np.uint8)
            queue = []
            off = 0
            for n in sizes:
                if n <= codec.TINY_UNIFORM_MAX:
                    parts = [occ[off : off + n]]
                else:
                    parts = [occ[off : off + n : 2]]
                    if n // 2:
                        parts.append(occ[off + 1 : off + n : 2])
                for p in parts:
                    buf = np.zeros(rans.pad_to_chunk(len(p)), np.uint8)
                    buf[: len(p)] = p
                    queue.append(jax.device_put(buf))
                off += n
            jax.block_until_ready(queue[-1])

            class OracleDec:
                """decode_group contract, symbols pre-staged on device —
                the chain runs every program decode runs EXCEPT the rANS
                scans; the delta vs the real decoder is the scan cost."""

                _i = 0

                def decode_group(self, rows, n):
                    del rows, n
                    out = queue[OracleDec._i]
                    OracleDec._i = (OracleDec._i + 1) % len(queue)
                    return out

            dec = OracleDec()
        t0 = time.time()
        codec.decode(
            dec, max_level, np.array(slices.pos_mm, np.int64),
            angular=True, ground_truth=None, level_sizes=sizes,
        )
        return time.time() - t0

    order = ["expand", "p1", "p1sf", "p2", "full"]
    walls = {}
    for stage in order:
        run_variant(stage)  # warm (combine program + any cold paths)
        ts = [run_variant(stage) for _ in range(3)]
        walls[stage] = sorted(ts)[1]
        print(f"enc[{stage:6s}] {walls[stage]:7.3f} s", flush=True)
    prev = 0.0
    for stage in order:
        print(f"  delta {stage:6s} {walls[stage] - prev:7.3f} s")
        prev = walls[stage]

    for oracle in (False, True):
        tag = "oracle" if oracle else "full"
        try:
            run_dec(oracle)
            ts = [run_dec(oracle) for _ in range(3)]
            print(f"dec[{tag:6s}] {sorted(ts)[1]:7.3f} s", flush=True)
        except Exception as e:  # oracle shape mismatch: timing-only probe
            print(f"dec[{tag}] failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
