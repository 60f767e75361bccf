"""Training CLI (reference train.py surface).

    python -m scp_tpu.cli.train --config-name train_kitti_ehem.yaml \
        data.batch_size=16 data.root='data/kitti/spher/*.npy'

Hydra-style dotted overrides are positional arguments.
"""

from __future__ import annotations

import argparse
import datetime
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", default="train_obj.yaml")
    ap.add_argument("--config-dir", default="configs")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    # multi-host (DCN) bring-up must precede every other JAX call — it
    # changes the device topology (SCP_MULTIHOST / SCP_COORDINATOR env,
    # recipe in scp_tpu/train/distributed.py)
    from scp_tpu.train.distributed import maybe_initialize

    pid = maybe_initialize()

    from scp_tpu.config import load_config
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config_name, args.config_dir, args.overrides)
    if pid == 0:
        print(cfg.to_plain())

    import jax

    from scp_tpu.train.data import build_dataset
    from scp_tpu.train.trainer import Trainer

    seed = int(cfg.get("seed", cfg.train.get("seed", 42)))
    cfg.seed = seed

    dataset = build_dataset(cfg)
    trainer = Trainer(cfg, steps_per_epoch=dataset.steps_per_epoch())

    # validation batches (bits/node curve in metrics.jsonl): HELD-OUT when
    # cfg.data.val_root points at disjoint shards; without val_root this is
    # an IN-DISTRIBUTION check (differently-seeded pass over the training
    # shards) — it tracks train loss and cannot detect overfitting
    val_batches = None
    n_val = int(cfg.data.get("val_batches", 4))
    if n_val:
        from scp_tpu.train.data import ShardDataset

        val_ds = ShardDataset(
            root=str(cfg.data.get("val_root") or cfg.data.root),
            context_size=cfg.data.context_size,
            batch_size=dataset.batch_size,  # local slice (multi-host DP)
            mode=dataset.mode,
            vari_data_len=False,
            seed=seed + 1,
            process_index=dataset.process_index,
            process_count=dataset.process_count,
        )
        gen = val_ds.batches()
        val_batches = [next(gen) for _ in range(n_val)]

    if args.run_dir:
        run_dir = args.run_dir
    else:
        now = datetime.datetime.now()
        run_dir = os.path.join(
            cfg.train.get("run_root", "outputs"),
            str(cfg.train.type),
            now.strftime("%Y-%m-%d"),
            now.strftime("%H-%M-%S"),
        )
    print("saving in", run_dir)
    print("devices:", jax.devices())
    trainer.fit(dataset, run_dir, val_batches=val_batches)


if __name__ == "__main__":
    main()
