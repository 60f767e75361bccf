"""Standalone preprocessing-quality checker (reference
data_preproc/psnr_test.py): D1/D2 PSNR + Chamfer of `<name>_quant.ply`
reconstructions against the originals.

    python -m scp_tpu.tools.psnr_test --type kitti \
        --ori_dir 'data/kitti/test_norm/*/*.ply' --quant_dir data/kitti/spher_16
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np

from scp_tpu.core.pointcloud import read_points
from scp_tpu.metrics import PEAKS, chamfer, d1_d2_psnr
from scp_tpu.tools.gene_normals import read_normals_ply


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", type=str, default="kitti", choices=["kitti", "ford"])
    ap.add_argument("--ori_dir", type=str, required=True)
    ap.add_argument("--quant_dir", type=str, required=True)
    ap.add_argument("--with_normals", action="store_true",
                    help="ori files carry normals (gene_normals output)")
    args = ap.parse_args(argv)

    files = sorted(glob.glob(args.ori_dir))
    peak = PEAKS[args.type]
    d1s, d2s, cds = [], [], []
    for f in files:
        p = Path(f)
        name = (str(p.parent).split("/")[-1] + p.stem) if args.type == "kitti" else p.stem
        qf = os.path.join(args.quant_dir, name + "_quant.ply")
        if not os.path.exists(qf):
            print("missing", qf)
            continue
        if args.with_normals:
            pts, normals = read_normals_ply(f)
        else:
            pts, normals = read_points(f), None
        quant = read_points(qf)
        d1, d2 = d1_d2_psnr(pts, quant, peak, normals)
        cd = chamfer(pts.copy(), quant.copy())
        d1s.append(d1)
        d2s.append(d2)
        cds.append(cd)
        print(f"{name}: D1 {d1:.3f}  D2 {d2:.3f}  chamfer {cd:.5f}")
    if d1s:
        print(
            f"mean over {len(d1s)}: D1 {np.mean(d1s):.3f} "
            f"D2 {np.mean(d2s):.3f} chamfer {np.mean(cds):.5f}"
        )


if __name__ == "__main__":
    main()
