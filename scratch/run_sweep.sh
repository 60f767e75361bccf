#!/bin/bash
# Regenerate the CLI rate-sweep artifacts (test_results_same_kitti_*.txt)
# with the current bench checkpoint: 2 held-out synthetic scans through
# the real encode/decode CLIs at spherical L12/14/16 (+ cylindrical L14
# smoke).  Run on the chip.
set -e
cd "$(dirname "$0")/.."
CKPT=outputs/bench_ckpt_r3b/ckpt/epoch=19-step=12340

python - <<'EOF'
import os
import numpy as np
from scp_tpu.tools.train_bench_ckpt import synth_kitti
from scp_tpu.core.pointcloud import write_ply
os.makedirs("data/sweep_test", exist_ok=True)
for i, seed in enumerate((9000, 9001)):
    p = f"data/sweep_test/scan{i}.ply"
    if not os.path.exists(p):
        rng = np.random.default_rng(seed)
        write_ply(p, synth_kitti(rng, 60_000))
        print("wrote", p)
EOF

for L in 12 14 16; do
  echo "=== spher L$L encode"
  python -m scp_tpu.cli.encode --ckpt_path "$CKPT" --type kitti \
    --lidar_level "$L" --spher --out_dir "outputs/sweep_r3/L$L" \
    --test_files 'data/sweep_test/*.ply'
  echo "=== spher L$L decode"
  python -m scp_tpu.cli.decode --ckpt_path "$CKPT" --type kitti \
    --bin_dir "outputs/sweep_r3/L$L" --test_files data/sweep_test/
done

echo "=== cylin L14 encode+decode"
python -m scp_tpu.cli.encode --ckpt_path "$CKPT" --type kitti \
  --lidar_level 14 --cylin --out_dir outputs/sweep_r3/cyl14 \
  --test_files 'data/sweep_test/*.ply'
python -m scp_tpu.cli.decode --ckpt_path "$CKPT" --type kitti \
  --bin_dir outputs/sweep_r3/cyl14 --test_files data/sweep_test/
echo SWEEP_DONE
