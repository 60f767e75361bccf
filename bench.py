"""Headline benchmark: EHEM encode+decode throughput (points/sec) on one
TPU chip, KITTI-like synthetic LiDAR cloud at lidar_level 16.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference (PyTorch EHEM on one A100-class GPU) processes
roughly 6e4 points/sec through encode+decode at KITTI L16 (SURVEY.md §6 —
the repo commits no numbers; 2s/frame for a ~120k-point scan is the
published EHEM order of magnitude).  BASELINE.md's north star is >=10x.
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

import numpy as np

BASELINE_POINTS_PER_SEC = 6.0e4
N_POINTS = int(os.environ.get("BENCH_POINTS", 120_000))


def synth_kitti(rng, n):
    """Ring-structured LiDAR-like sweep — single source of truth lives in
    scp_tpu.tools.train_bench_ckpt (training, baseline harness, and the
    OctAttention benchmark all draw from the same distribution)."""
    from scp_tpu.tools.train_bench_ckpt import synth_kitti as gen

    return gen(rng, n)


def _wait_for_backend(budget_s: float = 600.0) -> None:
    """The axon tunnel drops for multi-minute windows; don't let the
    round-end bench die on one.  Probe with a tiny program in a child
    process (a stalled init can wedge the parent's backend state) and
    block up to `budget_s` until the chip answers.  Capped at ~600 s:
    a longer outage must not eat the whole bench budget (round-4 lesson —
    BENCH_r04 spent ~14 min probing and then got killed mid-warmup)."""
    import subprocess

    deadline = time.time() + budget_s
    probe = (
        "import jax\n"
        "x = jax.jit(lambda a: a + 1)(jax.numpy.ones((8, 8)))\n"
        "assert float(x.sum()) == 128.0\n"
    )
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=120,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return
        if time.time() > deadline:
            print("# WARNING: TPU backend unreachable after "
                  f"{budget_s:.0f}s of probing; proceeding anyway",
                  file=sys.stderr)
            return
        print("# backend probe failed; retrying in 60s", file=sys.stderr)
        time.sleep(60)


def _drain(gen):
    try:
        while True:
            next(gen)
    except StopIteration as e:
        return e.value


def pipeline_bench(codec, slices_list):
    """Throughput mode: K clouds in flight through ONE codec.

    All encodes are dispatched before any payload fetch (each fetch then
    overlaps the other clouds' queued device work), and the decodes run
    as interleaved level steppers — cloud B's dispatches and fetches ride
    in cloud A's host gaps.  The TPU executes one program at a time, so
    the aggregate ceiling is total device work; what pipelining removes
    is every host-blocking segment (payload fetch, output fetch, dispatch
    gaps) from the critical path.  Role model: the reference processes
    files strictly serially (reference encode.py:264-291)."""
    t0 = time.time()
    encs = []
    for sl in slices_list:
        enc = codec.new_stream_encoder()
        codec.encode_into(enc, sl)
        encs.append(enc)
    streams = [codec.finish_stream(enc)[0] for enc in encs]

    gens = []
    for sl, stream in zip(slices_list, streams):
        dec = codec.new_stream_decoder(
            stream, codec.ac_symbols_per_node * sl.occ_stream.shape[0]
        )
        gens.append(
            codec.decode_steps(
                dec,
                sl.max_level,
                np.array(sl.pos_mm, np.int64),
                angular=True,
                ground_truth=sl.occ_stream,
                level_sizes=sl.level_sizes,
            )
        )
    live = list(gens)
    codes = [None] * len(gens)
    while live:
        for g in list(live):
            try:
                next(g)
            except StopIteration as e:
                codes[gens.index(g)] = e.value
                live.remove(g)
    wall = time.time() - t0
    for sl, c in zip(slices_list, codes):
        assert (c == sl.occ_stream).all()
    return wall


def _emit(result: dict) -> None:
    """Print the JSON record line and flush.  Called after the FIRST
    measured pass and re-called whenever a later pass improves it, so a
    kill at any point after one pass still leaves a parseable record
    (the driver takes the last JSON line).  Round-4 lesson: bench.py
    emitted only at the very end and rc=124 forfeited the round."""
    print(json.dumps(result), flush=True)


def main():
    t_start = time.time()
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_S", "2400"))
    _wait_for_backend(budget_s=min(600.0, max(120.0, deadline - time.time() - 900.0)))

    # env vars alone are ignored on the axon backend (sitecustomize
    # initializes JAX first) — this applies jax.config.update so compiled
    # programs actually persist across processes
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from scp_tpu import ac
    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.models.ehem import EHEM

    rng = np.random.default_rng(0)
    pts = synth_kitti(rng, N_POINTS)

    t0 = time.time()
    res = preprocess_points(pts, system="spher", qs=kitti_qs(16))
    slices = split_levels(res.context, angular=True)
    t_pre = time.time() - t0

    model = EHEM(dtype=jnp.bfloat16)
    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.environ.get("BENCH_CKPT") or ""
    if not ckpt:
        # Default: the static-KNN-adapted checkpoint + knob (position KNN
        # graph reused for all three EdgeConv rounds).  Measured 60,040
        # pts/s vs 55.5k dynamic at +0.27% rate (bpp 18.225 vs 18.175;
        # adaptation receipt: checkpoints/ehem_synth_f16_sknn.metrics.jsonl,
        # val 3.0998 vs 3.094 bits/node).  SCP_STATIC_KNN=0 restores the
        # reference-matching dynamic-graph path with the base checkpoint.
        sknn = os.path.join(here, "checkpoints", "ehem_synth_f16_sknn.npz")
        if os.environ.get("SCP_STATIC_KNN", "1") != "0" and os.path.exists(sknn):
            os.environ["SCP_STATIC_KNN"] = "1"
            ckpt = sknn
        else:
            ckpt = os.path.join(here, "checkpoints", "ehem_synth_f16.npz")
    if os.path.exists(ckpt):
        from scp_tpu.train.checkpoints import load_params_npz

        variables = load_params_npz(ckpt)
        print(f"# loaded trained checkpoint {os.path.basename(ckpt)}", file=sys.stderr)
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 16, 4, 3), np.int32),
            np.zeros((1, 16, 3), np.float32),
        )
        print("# WARNING: no checkpoint, benching an untrained model", file=sys.stderr)
    codec = EHEMCodec(model, variables, context_size=8192)

    # Warm-up: compile every program this cloud uses (excluded from timing),
    # then one throwaway encode+decode pass to flush remaining lazy
    # initialization; the measured passes are steady state.  When the
    # deadline is close (tunnel outage ate the budget), the throwaway
    # passes are skipped — the first measured pass then doubles as the
    # warm pass (slower, but it still produces a record).
    t0 = time.time()
    n_progs = codec.warmup(slices)
    print(f"# warmup: {n_progs} programs in {time.time() - t0:.1f}s", file=sys.stderr)
    if deadline - time.time() > 300.0:
        t0 = time.time()
        warm_stream, _, _ = codec.encode_to_stream(slices)
        print(f"# warm enc pass: {time.time() - t0:.1f}s", file=sys.stderr)
        # warm decode pass: compiles the level-composition-specific programs
        # (row-buffer assembly arities, occupancy slices) this cloud will use
        t0 = time.time()
        wdec = codec.new_stream_decoder(
            warm_stream, codec.ac_symbols_per_node * slices.occ_stream.shape[0]
        )
        codec.decode(
            wdec,
            slices.max_level,
            np.array(slices.pos_mm, np.int64),
            angular=True,
            ground_truth=slices.occ_stream,
            level_sizes=slices.level_sizes,
        )
        print(f"# warm dec pass: {time.time() - t0:.1f}s", file=sys.stderr)
    else:
        print("# behind deadline: skipping warm passes", file=sys.stderr)
    codec.timers.totals.clear(), codec.timers.counts.clear()

    # several measured passes, best total kept: the TPU tunnel has ~10%
    # run-to-run variance and occasional multi-second hiccups; steady-state
    # throughput is the quantity of record.  The JSON record line is
    # emitted after EVERY improving pass (not just at the end), and the
    # loop stops early once past the deadline — a kill at any point after
    # pass 0 leaves a valid record.
    best = None
    result = None
    for i in range(int(os.environ.get("BENCH_PASSES", "5"))):
        if best is not None and time.time() > deadline:
            print(f"# deadline reached after pass {i - 1}; stopping", file=sys.stderr)
            break
        t0 = time.time()
        stream, bits, model_s = codec.encode_to_stream(slices)
        t_enc = time.time() - t0
        print(f"# enc timers: {codec.timers.report()}", file=sys.stderr)
        codec.timers.totals.clear(), codec.timers.counts.clear()

        t0 = time.time()
        dec = codec.new_stream_decoder(
            stream, codec.ac_symbols_per_node * slices.occ_stream.shape[0]
        )
        codes = codec.decode(
            dec,
            slices.max_level,
            np.array(slices.pos_mm, np.int64),
            angular=True,
            ground_truth=slices.occ_stream,
            level_sizes=slices.level_sizes,
        )
        t_dec = time.time() - t0
        print(f"# dec timers: {codec.timers.report()}", file=sys.stderr)
        codec.timers.totals.clear(), codec.timers.counts.clear()
        assert (codes == slices.occ_stream).all()
        print(
            f"# pass {i}: enc={t_enc:.2f}s dec={t_dec:.2f}s", file=sys.stderr
        )
        if best is None or t_enc + t_dec < best[0] + best[1]:
            best = (t_enc, t_dec, bits, model_s)
            pps = N_POINTS / (t_enc + t_dec)
            result = {
                "metric": "ehem_enc_dec_points_per_sec_L16",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
            }
            _emit(result)
    t_enc, t_dec, bits, model_s = best
    pps = result["value"]
    print(
        f"# n_points={N_POINTS} nodes={slices.occ_stream.shape[0]} "
        f"pre={t_pre:.2f}s enc={t_enc:.2f}s (model {model_s:.2f}s) "
        f"dec={t_dec:.2f}s bpp={bits / N_POINTS:.3f}",
        file=sys.stderr,
    )

    # throughput mode (reported ALONGSIDE, never replacing, the
    # single-scan number): K clouds in flight through one codec
    k = int(os.environ.get("BENCH_PIPELINE", "0") or 0)
    if "--pipeline" in sys.argv:
        k = int(sys.argv[sys.argv.index("--pipeline") + 1])
    if k > 1 and time.time() > deadline - 300.0:
        print("# behind deadline: skipping pipeline mode", file=sys.stderr)
        k = 0
    if k > 1:
        others = [
            split_levels(
                preprocess_points(
                    synth_kitti(np.random.default_rng(100 + i), N_POINTS),
                    system="spher", qs=kitti_qs(16),
                ).context,
                angular=True,
            )
            for i in range(k - 1)
        ]
        batch = [slices] + others
        pipeline_bench(codec, batch)  # warm the extra clouds' programs
        wall = min(pipeline_bench(codec, batch) for _ in range(2))
        agg = k * N_POINTS / wall
        result["pipeline"] = {
            "clouds": k,
            "points_per_sec": round(agg, 1),
            "x_single_scan": round(agg / pps, 3),
        }
        print(
            f"# pipeline k={k}: {wall:.2f}s for {k} clouds -> "
            f"{agg:.0f} pts/s ({agg / pps:.2f}x single-scan)",
            file=sys.stderr,
        )
    _emit(result)
    print(f"# total bench wall: {time.time() - t_start:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
