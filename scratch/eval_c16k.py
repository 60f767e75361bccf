"""Resolve the round-4 orphan `ehem_synth_f16_sknn_c16k.npz` (VERDICT r5
task #3): evaluate it at its training context (16384, static-KNN graph)
against the committed sknn ckpt at 8192 on regenerated held-out shards.

Shards are a pure function of the generator seeds (tools/train_bench_ckpt.
gen_shards, seed_base 5000), so the round-4 val numbers are directly
comparable.  Run with SCP_STATIC_KNN=1 (both ckpts are position-graph
adapted).

    SCP_STATIC_KNN=1 python scratch/eval_c16k.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "scp_tpu_xla"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("SCP_STATIC_KNN", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from scp_tpu.config import load_config
    from scp_tpu.tools.train_bench_ckpt import gen_shards
    from scp_tpu.train.checkpoints import load_params_npz
    from scp_tpu.train.data import ShardDataset
    from scp_tpu.train.trainer import Trainer, TrainState

    val_dir = "data/synth_kitti_val"
    gen_shards(val_dir, 2, 120_000, 16, seed_base=5000, system="spher")

    jobs = [
        ("checkpoints/ehem_synth_f16_sknn.npz", 8192),
        ("checkpoints/ehem_synth_f16_sknn.npz", 16384),   # zero-shot control
        ("checkpoints/ehem_synth_f16_sknn_c16k.npz", 16384),
        ("checkpoints/ehem_synth_f16_sknn_c16k.npz", 8192),  # back-compat
    ]
    for ckpt, ctx in jobs:
        variables = load_params_npz(ckpt)
        batch = max(1, 65536 // ctx)
        cfg = load_config("train_kitti_ehem.yaml", config_dir="configs")
        cfg.model.context_size = ctx
        cfg.data.context_size = ctx
        cfg.data.batch_size = batch
        cfg.bf16 = True
        ds = ShardDataset(
            root=os.path.join(val_dir, "*.npy"), context_size=ctx,
            batch_size=batch, mode="ehem", vari_data_len=False, seed=7,
        )
        gen = ds.batches()
        val_batches = [next(gen) for _ in range(4)]
        n_tok = sum(b["data"].shape[0] * b["data"].shape[1] for b in val_batches)
        trainer = Trainer(cfg, steps_per_epoch=1)
        trainer._constants = {}
        state = TrainState(
            variables["params"], variables.get("batch_stats", {}), None, 0,
        )
        t0 = time.time()
        bits = trainer.evaluate(state, val_batches)
        print(
            f"{os.path.basename(ckpt):34s} ctx {ctx:6d} "
            f"({n_tok} tokens): {bits:.4f} bits/node "
            f"[{time.time() - t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
