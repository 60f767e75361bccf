"""Measure the reference implementation (CPU torch) for BASELINE.md.

Runs the ORIGINAL SCP code at /root/reference (read-only, imported at
runtime — nothing is copied) on the same synthetic clouds/shards our
framework benches on, producing the reference side of BASELINE.md:

  * forward:  per-chunk EHEM encode forward + two-phase decode seconds
              (the quantities the reference wall-clocks, encode.py:50-52,
              decode_ehem.py:147-168)
  * train:    Adam training steps on our (N, 4, 6) shards (the shard
              contract is shared), loss in bits/node (ehem.py:205-208)

pytorch_lightning is not installed in this image; the reference model only
uses pl.LightningModule as an nn.Module with a .log method, so a 10-line
shim stands in.  The reference model runs full-size (context 8192, Swin
depths 4,4,4,4,2) unless --small.

    python -m scp_tpu.tools.ref_baseline --mode forward --points 30000
    python -m scp_tpu.tools.ref_baseline --mode train --steps 20 --batch 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REF_DIR = os.environ.get("SCP_REFERENCE_DIR", "/root/reference")


def _import_reference():
    """Import the reference EHEM with a pytorch_lightning shim."""
    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def log(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    from models.ehem import EHEM as RefEHEM  # noqa: PLC0415

    return RefEHEM


def _ref_cfg():
    m = types.SimpleNamespace(max_level=19, token_num=255, context_size=8192)
    d = types.SimpleNamespace(vari_data_len=False)
    t = types.SimpleNamespace(lr=1e-4)
    return types.SimpleNamespace(model=m, data=d, train=t)


def _synth_slices(points: int, lidar_level: int):
    import numpy as np

    from scp_tpu.codec.slices import split_levels
    from scp_tpu.core.preprocess import kitti_qs, preprocess_points
    from scp_tpu.tools.train_bench_ckpt import synth_kitti

    rng = np.random.default_rng(0)  # bench.py's held-out cloud distribution
    pts = synth_kitti(rng, points)
    res = preprocess_points(pts, system="spher", qs=kitti_qs(lidar_level))
    return split_levels(res.context, angular=True), pts


def mode_forward(args):
    """Per-chunk forward/decode seconds of the reference EHEM on CPU."""
    import numpy as np
    import torch

    RefEHEM = _import_reference()
    torch.set_num_threads(os.cpu_count() or 1)
    model = RefEHEM(_ref_cfg()).eval()

    slices, pts = _synth_slices(args.points, args.lidar_level)
    n_nodes = slices.occ_stream.shape[0]
    csz = 8192

    enc_s, dec_s, chunks_done = 0.0, 0.0, 0
    done = False
    with torch.no_grad():
        # deepest levels first: they hold the full-size chunks that dominate
        for li in reversed(range(slices.num_levels)):
            d = slices.data[li]
            pos = slices.level_pos(li)
            for s in range(0, d.shape[0], csz):
                m = min(csz, d.shape[0] - s)
                data_t = torch.from_numpy(d[s : s + m][None]).long()
                pos_t = torch.from_numpy(pos[s : s + m].T[None]).float()
                t0 = time.time()
                p1, p2 = model(data_t, pos_t, enc=True)
                enc_s += time.time() - t0
                # two-phase decode (decode_ehem.py:156-168): trunk + mlp1,
                # then cross stage keyed by group-1 occupancies
                nodes1 = torch.from_numpy(
                    d[s : s + m][0::2, -1, 2][None]
                ).long()
                t0 = time.time()
                model.decode(data_t, pos_t)
                model.decode(data_t, pos_t, nodes1)
                dec_s += time.time() - t0
                chunks_done += 1
                if args.max_chunks and chunks_done >= args.max_chunks:
                    done = True
                    break
            if done:
                break
    return _fwd_report(args, n_nodes, len(pts), enc_s, dec_s, chunks_done)


def _fwd_report(args, n_nodes, n_points, enc_s, dec_s, chunks):
    total_chunks = -(-n_nodes // 8192) + 10  # ~1 partial chunk per level
    out = {
        "what": "reference EHEM forward timing (CPU torch)",
        "points": n_points,
        "nodes": n_nodes,
        "chunks_measured": chunks,
        "enc_s_per_chunk": round(enc_s / max(chunks, 1), 3),
        "dec_s_per_chunk": round(dec_s / max(chunks, 1), 3),
        "est_enc_s_full_cloud": round(enc_s / max(chunks, 1) * total_chunks, 1),
        "est_dec_s_full_cloud": round(dec_s / max(chunks, 1) * total_chunks, 1),
        "threads": os.cpu_count(),
    }
    print(json.dumps(out))
    return out


def mode_train(args):
    """Reference training steps on our synthetic shards; loss bits/node."""
    import math

    import numpy as np
    import torch

    from scp_tpu.tools.train_bench_ckpt import gen_shards

    RefEHEM = _import_reference()
    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(42)
    model = RefEHEM(_ref_cfg()).train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = torch.nn.CrossEntropyLoss()

    gen_shards(args.shard_dir, args.clouds, args.points, args.lidar_level)
    from scp_tpu.train.data import ShardDataset

    ds = ShardDataset(
        root=os.path.join(args.shard_dir, "*.npy"),
        context_size=args.context,
        batch_size=args.batch,
        mode="ehem",
        vari_data_len=False,
        seed=42,
    )
    gen = ds.batches()
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        b = next(gen)
        data = torch.from_numpy(b["data"]).long()
        pos = torch.from_numpy(b["pos"].transpose(0, 2, 1)).float()
        label = torch.from_numpy(b["label"]).long()
        pred = model(data, pos)
        loss = crit(pred.view(-1, 255), label.reshape(-1)) / math.log(2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        print(
            f"step {step + 1}/{args.steps} loss {losses[-1]:.4f} bits/node "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if args.budget_s and time.time() - t0 > args.budget_s:
            break
    out = {
        "what": "reference EHEM training (CPU torch)",
        "steps": len(losses),
        "batch": args.batch,
        "context": args.context,
        "s_per_step": round((time.time() - t0) / max(len(losses), 1), 2),
        "first_loss": round(losses[0], 4),
        "last_loss": round(losses[-1], 4),
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["forward", "train"], required=True)
    ap.add_argument("--points", type=int, default=30_000)
    ap.add_argument("--lidar_level", type=int, default=16)
    ap.add_argument("--max_chunks", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--clouds", type=int, default=2)
    ap.add_argument("--budget_s", type=float, default=0.0)
    ap.add_argument("--shard_dir", default="data/synth_kitti_ref")
    args = ap.parse_args(argv)
    if not os.path.isdir(REF_DIR):
        print(json.dumps({"error": f"reference not found at {REF_DIR}"}))
        return 1
    if args.mode == "forward":
        mode_forward(args)
    else:
        mode_train(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
