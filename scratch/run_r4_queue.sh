#!/bin/bash
# Round-4 chip queue (run AFTER the sknn adaptation finishes; one at a time —
# the chip serializes everything anyway and concurrent processes distort timing):
set -e
cd "$(dirname "$0")/.."

# 1. A/B the static-KNN adapted checkpoint through the real bench
SCP_STATIC_KNN=1 BENCH_CKPT=checkpoints/ehem_synth_f16_sknn.npz python bench.py 2>bench_sknn.err || true

# 2. context-16k zero-shot probe (VERDICT #8)
python scratch/probe_ctx16k.py

# 3. OctAttention L12 continuation to budget (VERDICT #5)
python -m scp_tpu.cli.train --config-name train_kitti.yaml --run-dir outputs/octattn_l12_v2 \
  data.root='data/synth_l12/*.npy' data.val_root='data/synth_l12_val/*.npy' \
  train.load_pretrain=checkpoints/octattn_synth_l12.npz train.lr=0.0001 \
  train.epoch=17 train.lr_scheduler.step_size=6 train.lr_scheduler.gamma=0.5

# 4. cyl14 continuation to budget (VERDICT #5)
python -m scp_tpu.tools.train_bench_ckpt --system cylin --lidar_level 14 --steps 7800 \
  --shard_dir data/synth_cyl14 --run_dir outputs/cyl14_v2 \
  --init_npz checkpoints/ehem_synth_cyl14.npz --lr_scale 0.3 --lr_step 8 --lr_gamma 0.5 \
  --out checkpoints/ehem_synth_cyl14_v2.npz
