"""Compute/transfer breakdown + MFU for the codec and training step.

VERDICT r1 task 4: report device-compute seconds vs host-transfer vs AC
from actual measurements, and MFU for (a) a training step and (b) a codec
phase-1 forward.  FLOP counts come from XLA's own cost analysis of the
compiled programs; times are steady-state wall clocks on the live backend.

    python -m scp_tpu.tools.profile_codec --what codec --group 8
    python -m scp_tpu.tools.profile_codec --what train --batch 8

Peak FLOP/s for MFU defaults to SCP_TPU_PEAK_FLOPS or 197e12 (v5e bf16).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _time_call(fn, n=3):
    """Median-of-n steady-state wall time.  The axon backend defers
    execution until an output is FETCHED (block_until_ready returns
    immediately), so timing must round-trip a real fetch: fn() must
    np.asarray() something derived from the computation."""
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2]


def _fetch(x):
    import numpy as np

    return np.asarray(x)


def profile_codec(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.models.ehem import EHEM

    peak = float(os.environ.get("SCP_TPU_PEAK_FLOPS", 197e12))
    model = EHEM(dtype=jnp.bfloat16)
    ckpt = os.path.join("checkpoints", "ehem_synth_f16.npz")
    if os.path.exists(ckpt):
        from scp_tpu.train.checkpoints import load_params_npz

        variables = load_params_npz(ckpt)
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 16, 4, 3), np.int32),
            np.zeros((1, 16, 3), np.float32),
        )
    codec = EHEMCodec(model, variables, group_size=args.group)

    g, csz = args.group, 8192
    # steady-state timings: compute + a MINIMAL output fetch (the axon
    # backend defers execution to the first fetch).  In rans mode the CDF
    # rows never leave the device, so fetch one row only — fetching the
    # full tensor would charge the profile a transfer the codec never pays.
    if codec.mode == "rans":
        # the device-resident wavefront's buffer-fed programs
        cap = g * csz
        db = codec._replicate_or_put(np.zeros((cap, 4, 3), np.int32))
        pb = codec._replicate_or_put(np.zeros((cap, 3), np.int32))
        occ_dev = codec._replicate_or_put(np.zeros(cap, np.uint8))
        pa = (
            codec.variables, db, pb, np.int32(0), np.int32(2**31 - 1),
            np.int32(0), np.float32(1.0), g, csz,
        )
        inner = getattr(codec._p1_buf_fn, "__wrapped__", codec._p1_buf_fn)
        f1_flops = _flops_of(
            jax.jit(inner, static_argnums=(7, 8)).lower(*pa).compile()
        )
        rows1, f1, f2 = codec._p1_buf_fn(*pa)
        _fetch(rows1[0, 0])
        t_p1 = _time_call(lambda: _fetch(codec._p1_buf_fn(*pa)[0][0, 0]))
        evens, _ = codec._syms_fn(occ_dev, np.int32(0), np.int32(cap), g, csz)
        r2 = codec._p2_buf_fn(codec.variables, f1, f2, evens)
        _fetch(r2[0, 0])
        t_p2 = _time_call(
            lambda: _fetch(
                codec._p2_buf_fn(codec.variables, f1, f2, evens)[0, 0]
            )
        )
    else:
        d = np.zeros((g, csz, 4, 3), np.int32)
        d[:, :, :, 2] = 255
        p = np.zeros((g, csz, 3), np.float32)
        occ = np.full((g, csz // 2), 255, np.uint8)

        d = codec._pack_data(d)
        p = codec._pack_pos(p.astype(np.float32))
        lowered = codec._phase1_fn.lower(codec.variables, d, p)
        c1 = lowered.compile()
        f1_flops = _flops_of(c1)

        outs, f1, f2 = codec._phase1_fn(codec.variables, d, p)
        _fetch(outs[0])
        t_p1 = _time_call(
            lambda: _fetch(codec._phase1_fn(codec.variables, d, p)[0][0][0, 0])
        )
        out2 = codec._phase2_fn(codec.variables, f1, f2, occ)
        _fetch(out2[0] if isinstance(out2, tuple) else out2)

        def _p2_once():
            o = codec._phase2_fn(codec.variables, f1, f2, occ)
            if codec.mode == "staged":
                return _fetch(o[0])
            return _fetch(o)

        t_p2 = _time_call(_p2_once)

    # transfer: re-fetch already-computed rows (pure transfer cost)
    if codec.mode == "rans":
        # decode fetches one byte per node per parity; encode only the
        # compressed blocks — transfer is off the critical path entirely
        t_fetch_hi, fetch_bytes = 0.0, g * csz
        t_fetch_iv, iv_bytes = 0.0, 0
    elif codec.mode == "staged":
        hi1, cond1 = outs
        t_fetch_hi = _time_call(lambda: _fetch(hi1))
        iv = codec._iv_fn(hi1, cond1, occ)
        _fetch(iv)
        t_fetch_iv = _time_call(lambda: _fetch(iv))
        fetch_bytes = int(np.asarray(hi1).nbytes)
        iv_bytes = int(np.asarray(iv).nbytes)
    else:
        (cdf1,) = outs
        t_fetch_hi = _time_call(lambda: _fetch(cdf1))
        fetch_bytes = int(np.asarray(cdf1).nbytes)
        t_fetch_iv, iv_bytes = 0.0, 0

    # AC throughput on this host
    from scp_tpu import ac as ac_mod
    from scp_tpu.codec.staged import staged_cdfs_np

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (g * csz // 2, 255)).astype(np.float32)
    hi_cdf, cond_cdf = staged_cdfs_np(logits)
    syms = rng.integers(0, 255, g * csz // 2)
    enc = ac_mod.StreamingEncoder()
    hi, lo = syms >> 4, syms & 15
    t0 = time.time()
    enc.append_quantized(hi_cdf, hi.astype(np.int16))
    rows = cond_cdf[np.arange(len(syms)), hi]
    enc.append_quantized(rows, lo.astype(np.int16))
    stream, _ = enc.finish()
    t_ac_enc = time.time() - t0
    dec = ac_mod.ArithmeticDecoder(stream, 2 * len(syms))
    t0 = time.time()
    dec.decode_batch_quantized(hi_cdf)
    dec.decode_batch_quantized(rows)
    t_ac_dec = time.time() - t0

    nodes = g * csz
    out = {
        "what": "codec phase profile",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "mode": codec.mode,
        "group": g,
        "nodes_per_call": nodes,
        "phase1_flops": f1_flops,
        "phase1_s": round(t_p1, 4),
        "phase1_mfu_pct": round(100 * f1_flops / max(t_p1, 1e-9) / peak, 2),
        "phase2_s": round(t_p2, 4),
        "fetch_hi_cdf_s": round(t_fetch_hi, 4),
        "fetch_hi_cdf_bytes": fetch_bytes,
        "fetch_iv_s": round(t_fetch_iv, 4),
        "fetch_iv_bytes": iv_bytes,
        "ac_enc_s_per_mnode": round(t_ac_enc / nodes * 2e6, 2),
        "ac_dec_s_per_mnode": round(t_ac_dec / nodes * 2e6, 2),
        "peak_flops": peak,
    }
    print(json.dumps(out))
    return out


def profile_train(args):
    import jax
    import numpy as np

    from scp_tpu.config import load_config
    from scp_tpu.train.trainer import Trainer

    peak = float(os.environ.get("SCP_TPU_PEAK_FLOPS", 197e12))
    cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
    cfg.data.batch_size = args.batch
    cfg.bf16 = True
    # production recipe trains without remat (round-4 receipt: +11%
    # throughput, fits HBM at batch 8); --remat restores it for A/B
    cfg.remat = bool(args.remat)

    rng = np.random.default_rng(0)
    n = args.context
    batch = {
        "data": np.stack(
            [
                rng.integers(0, 17, (args.batch, n, 4)),
                rng.integers(0, 9, (args.batch, n, 4)),
                rng.integers(0, 255, (args.batch, n, 4)),
            ],
            axis=-1,
        ).astype(np.int32),
        "pos": rng.random((args.batch, n, 3), dtype=np.float32),
        "label": rng.integers(0, 255, (args.batch, n)).astype(np.int32),
    }
    trainer = Trainer(cfg, steps_per_epoch=100)
    state = trainer.init_state(batch)
    state, loss = trainer.train_step(state, batch)  # compile
    np.asarray(loss)  # axon: execution happens at fetch

    step_fn = trainer._train_step
    b_dev = jax.device_put(
        {k: jax.numpy.asarray(v) for k, v in batch.items()}, trainer.batch_shard
    )
    lowered = step_fn.lower(state, b_dev)
    flops = _flops_of(lowered.compile())

    times = []
    for _ in range(4):
        t0 = time.time()
        state, loss = step_fn(state, b_dev)
        np.asarray(loss)
        times.append(time.time() - t0)
    t_step = sorted(times)[len(times) // 2]

    out = {
        "what": "train step profile",
        "backend": jax.default_backend(),
        "batch": args.batch,
        "context": args.context,
        "step_flops": flops,
        "step_s": round(t_step, 4),
        "mfu_pct": round(100 * flops / max(t_step, 1e-9) / peak, 2),
        "tokens_per_s": round(args.batch * args.context / t_step, 1),
        "peak_flops": peak,
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["codec", "train"], required=True)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args(argv)
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.what == "codec":
        profile_codec(args)
    else:
        profile_train(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
