#!/bin/bash
# Protocol-correct rate sweeps: per-config trained checkpoints
# (the reference trains one model per coordinate system / model family).
#   cylin EHEM L14  <- checkpoints/ehem_synth_cyl14 run
#   OctAttention spher L12 <- outputs/octattn_l12 run
set -e
cd "$(dirname "$0")/.."

if [ -d outputs/cyl14_ckpt/ckpt ]; then
  CK=$(ls outputs/cyl14_ckpt/ckpt | sort -t= -k2 -V | tail -1)
  echo "=== cylin L14 (per-system ckpt $CK) encode+decode"
  python -m scp_tpu.cli.encode --ckpt_path "outputs/cyl14_ckpt/ckpt/$CK" \
    --type kitti --lidar_level 14 --cylin --out_dir outputs/sweep_r3/cyl14_pp \
    --test_files 'data/sweep_test/*.ply'
  python -m scp_tpu.cli.decode --ckpt_path "outputs/cyl14_ckpt/ckpt/$CK" \
    --type kitti --bin_dir outputs/sweep_r3/cyl14_pp --test_files data/sweep_test/
fi

if [ -d outputs/octattn_l12/ckpt ]; then
  CK=$(ls outputs/octattn_l12/ckpt | sort -t= -k2 -V | tail -1)
  echo "=== OctAttention spher L12 (ckpt $CK) encode+decode"
  python -m scp_tpu.cli.encode --ckpt_path "outputs/octattn_l12/ckpt/$CK" \
    --type kitti --lidar_level 12 --spher --out_dir outputs/sweep_r3/octattn_l12 \
    --test_files 'data/sweep_test/*.ply'
  python -m scp_tpu.cli.decode --ckpt_path "outputs/octattn_l12/ckpt/$CK" \
    --type kitti --incremental --bin_dir outputs/sweep_r3/octattn_l12 \
    --test_files data/sweep_test/
fi
echo SWEEP2_DONE
