"""Context-length probe past the 3.094 bits/node recipe ceiling (VERDICT r3
task #8): evaluate the committed 12k-step bench checkpoint on held-out
shards at context 8192 (the training length, control) vs 16384.

The model is context-agnostic (no absolute position embed at full size;
Swin windows are 512 tokens at every merge stage), so longer chunks are a
FREE inference-time knob — the reference's vari-length training makes the
same move available there (reference models/ehem.py:198-204).  The gain
mechanism is fewer chunk boundaries: nodes near a window edge see a
truncated neighborhood, and 16384-token chunks halve the number of edges.

    python scratch/probe_ctx16k.py [--ckpt checkpoints/ehem_synth_f16.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/ehem_synth_f16.npz")
    ap.add_argument("--val_root", default="data/synth_kitti_val/*.npy")
    ap.add_argument("--contexts", type=int, nargs="+",
                    default=[8192, 16384])
    ap.add_argument("--tokens", type=int, default=65536,
                    help="tokens per eval batch (batch = tokens/context)")
    ap.add_argument("--n_batches", type=int, default=4)
    args = ap.parse_args()

    from scp_tpu.config import load_config
    from scp_tpu.train.checkpoints import load_params_npz
    from scp_tpu.train.data import ShardDataset
    from scp_tpu.train.trainer import Trainer, TrainState

    variables = load_params_npz(args.ckpt)

    for ctx in args.contexts:
        batch = max(1, args.tokens // ctx)
        cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
        cfg.model.context_size = ctx
        cfg.data.context_size = ctx
        cfg.data.batch_size = batch
        cfg.bf16 = True
        ds = ShardDataset(
            root=args.val_root, context_size=ctx, batch_size=batch,
            mode="ehem", vari_data_len=False, seed=7,
        )
        gen = ds.batches()
        val_batches = [next(gen) for _ in range(args.n_batches)]
        n_tok = sum(int(b["data"].shape[0] * b["data"].shape[1])
                    for b in val_batches)

        trainer = Trainer(cfg, steps_per_epoch=1)
        # evaluate() needs only params/batch_stats; seed _constants the same
        # way init_state would (non-param collections of a fresh init)
        trainer._constants = {}
        state = TrainState(
            variables["params"], variables.get("batch_stats", {}), None, 0,
        )
        t0 = time.time()
        bits = trainer.evaluate(state, val_batches)
        print(
            f"context {ctx:6d} (batch {batch}, {n_tok} tokens): "
            f"{bits:.4f} bits/node  [{time.time() - t0:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
