#!/bin/bash
# Round-4 protocol sweeps with the budget-equalized v2 checkpoints.
set -e
cd "$(dirname "$0")/.."

CK=$(ls outputs/cyl14_v2/ckpt | sort -t= -k2 -V | tail -1)
echo "=== cylin L14 (v2 ckpt $CK) encode+decode"
python -m scp_tpu.cli.encode --ckpt_path "outputs/cyl14_v2/ckpt/$CK" \
  --type kitti --lidar_level 14 --cylin --out_dir outputs/sweep_r4/cyl14_v2 \
  --test_files 'data/sweep_test/*.ply'
python -m scp_tpu.cli.decode --ckpt_path "outputs/cyl14_v2/ckpt/$CK" \
  --type kitti --bin_dir outputs/sweep_r4/cyl14_v2 --test_files data/sweep_test/

CK=$(ls outputs/octattn_l12_v2/ckpt | sort -t= -k2 -V | tail -1)
echo "=== OctAttention spher L12 (v2 ckpt $CK) encode+decode"
python -m scp_tpu.cli.encode --ckpt_path "outputs/octattn_l12_v2/ckpt/$CK" \
  --type kitti --lidar_level 12 --spher --out_dir outputs/sweep_r4/octattn_l12_v2 \
  --test_files 'data/sweep_test/*.ply'
python -m scp_tpu.cli.decode --ckpt_path "outputs/octattn_l12_v2/ckpt/$CK" \
  --type kitti --incremental --bin_dir outputs/sweep_r4/octattn_l12_v2 \
  --test_files data/sweep_test/
echo SWEEP_V2_DONE
