"""Encode CLI (reference encode.py surface).

    python -m scp_tpu.cli.encode --ckpt_path <run>/ckpt/<name> \
        --type kitti --lidar_level 16 --spher \
        --preproc_path data/kitti/spher_16/ --test_files 'data/.../*.ply'

Reads the run's archived config, loads the checkpoint, preprocesses (or
reuses cached shards), entropy-codes each cloud, writes the bitstream
(reference-style filename + self-contained header) and reports
bpp / bits-per-node / PSNR / Chamfer / model seconds, appending the
aggregate to test_results_same_<type>_<level>.txt (reference
encode.py:293-305).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def get_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", type=str, required=True)
    ap.add_argument("--test_files", nargs="*", default=[])
    ap.add_argument("--sequential", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="OctAttention KV-cache window schedule")
    ap.add_argument("--type", type=str, default="obj", choices=["obj", "kitti", "ford"])
    ap.add_argument("--lidar_level", type=int, default=12)
    ap.add_argument("--level_wise", action="store_true")
    ap.add_argument("--cylin", action="store_true")
    ap.add_argument("--spher", action="store_true")
    ap.add_argument("--mullevel", action="store_true")
    ap.add_argument("--preproc_path", type=str, default="")
    ap.add_argument("--normals_dir", type=str, default="",
                    help="dir of <stem>.ply normals (tools/gene_normals) "
                    "enabling D2 PSNR, reference pt.py:68-79 -n flag")
    ap.add_argument("--out_dir", type=str, default=None)
    return ap.parse_args(argv)


def _fmt_psnr(vals) -> str:
    """Mean PSNR, or "N/A" for cached-preproc runs (PSNR never measured —
    the per-file values are NaN, distinct from a measured zero)."""
    a = np.asarray(vals, np.float64)
    if np.isnan(a).all():
        return "N/A"
    return str(float(np.nanmean(a)))


def resolve_run(ckpt_path: str):
    """<run_dir>/ckpt/<name> -> (run_dir, test_output dir).

    Splits on the `ckpt` PATH COMPONENT (a run dir whose name merely
    contains the substring, e.g. `outputs/bench_ckpt`, must not match)."""
    parts = ckpt_path.replace(os.sep, "/").rstrip("/").split("/")
    if "ckpt" not in parts:
        raise SystemExit(
            f"--ckpt_path must point inside a <run>/ckpt/ directory: {ckpt_path}"
        )
    i = len(parts) - 1 - parts[::-1].index("ckpt")
    run_dir = "/".join(parts[:i]) or "."
    name = "/".join(parts[i + 1 :])
    return run_dir, os.path.join(run_dir, "test_output", name)


def main(argv=None):
    from scp_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = get_args(argv)
    from scp_tpu.cli.codec_common import CodecSession

    run_dir, out_dir = resolve_run(args.ckpt_path)
    if args.out_dir:
        out_dir = args.out_dir
    session = CodecSession(args.ckpt_path, run_dir)

    test_files = args.test_files
    combine = False
    if test_files and "*" in test_files[0]:
        test_files = sorted(glob.glob(test_files[0]))
        combine = True

    system = "spher" if args.spher else ("cylin" if args.cylin else "cart")
    bpps, times, psnrs, psnrs_d2, chamfers = [], [], [], [], []
    for i, f in enumerate(test_files):
        print(f"Encoding {f} {i}/{len(test_files)}")
        stats = session.encode_file(
            f,
            out_dir,
            data_type=args.type,
            lidar_level=args.lidar_level,
            system=system,
            preproc_path=args.preproc_path,
            sequential=args.sequential,
            incremental=args.incremental,
            mullevel=args.mullevel,
            level_wise=args.level_wise,
            normals_dir=args.normals_dir,
        )
        bpps.append(stats["bpp"])
        times.append(stats["seconds"])
        psnrs.append(stats["psnr_d1"])
        psnrs_d2.append(stats["psnr_d2"])
        chamfers.append(stats["chamfer"])
        for k in ("outputfile", "seconds", "pt_num", "oct_num", "bits",
                  "bit_per_oct", "bpp"):
            print(f"{k:28s}: {stats[k]}")
        print(
            _fmt_psnr(psnrs), np.mean(bpps), np.mean(chamfers), np.mean(times)
        )

    if combine and test_files:
        d2_line = (
            f"PSNR_D2: {_fmt_psnr(psnrs_d2)}\n" if args.normals_dir else ""
        )
        out = (
            f"same {args.lidar_level} {args.test_files} {args.ckpt_path}\n"
            f"sample number: {len(bpps)}\ntimes: {float(np.mean(times))}\n"
            f"bpp: {float(np.mean(bpps))}\nchamfer_dist: {float(np.mean(chamfers))}\n"
            f"PSNR: {_fmt_psnr(psnrs)}\n{d2_line}\n"
        )
        with open(f"test_results_same_{args.type}_{args.lidar_level}.txt", "a") as fh:
            fh.write(out)
        print("bpp:", float(np.mean(bpps)))


if __name__ == "__main__":
    main()
