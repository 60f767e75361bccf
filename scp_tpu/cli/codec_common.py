"""Shared encode/decode session logic for the codec CLIs.

Handles: run-config round-trip, checkpoint loading, preprocessing cache
(`_meta.npy` compatible with the reference's, encode_dataset_ehem.py:132),
single- and multi-level (3-subtree) encoding, bitstream + sidecar output,
and full decode back to a Cartesian .ply.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

from scp_tpu import ac
from scp_tpu.codec.bitstream import (
    StreamHeader,
    pack_stream,
    reference_style_name,
    unpack_stream,
)
from scp_tpu.codec.ehem_codec import EHEMCodec
from scp_tpu.codec.octattn_codec import OctAttentionCodec
from scp_tpu.codec.slices import split_levels
from scp_tpu.config import load_run_config
from scp_tpu.core.octree import deoctree
from scp_tpu.core.pointcloud import read_points, write_ply
from scp_tpu.core.preprocess import ford_qs, kitti_qs, preprocess_points
from scp_tpu.core.quantize import QuantGrid
from scp_tpu.metrics import PEAKS, chamfer, d1_d2_psnr
from scp_tpu.models import build_model
from scp_tpu.train import checkpoints

MULLEVEL_PATHS = ([0, 0], [0, 1], [1])  # near/mid/far (reference test_gene.py:24-65)

# MVUB upper-body sequences need the axis rotation (reference
# data_preprocess.py:242-243)
MVUB_NAMES = (
    "andrew10", "david10", "phil10", "phil9", "ricardo10", "ricardo9", "sarah10",
)


def shard_name(ori_file: str, data_type: str) -> str:
    p = Path(ori_file)
    if data_type == "kitti":
        return p.parent.name + p.stem
    return p.stem


def level_qs(data_type: str, lidar_level: int) -> float:
    return kitti_qs(lidar_level) if data_type != "ford" else ford_qs(lidar_level)


def _level_counts(ctx: np.ndarray, max_level: int) -> np.ndarray:
    """Per-level node counts of one (N, 4, 6) shard for the stream header."""
    return np.bincount(
        ctx[:, -1, 1].astype(np.int64), minlength=max_level + 1
    )[1 : max_level + 1].astype(np.int64)


class CodecSession:
    def __init__(self, ckpt_path: str, run_dir: str):
        import jax.numpy as jnp

        self.cfg = load_run_config(run_dir)
        self.is_ehem = self.cfg.model.class_name.upper().startswith("EHEM")
        # EHEM phase chain runs bf16 by default (matches bench.py: ~same
        # rate as f32, MXU-native on TPU); SCP_CODEC_DTYPE=f32 opts out.
        # Params stay f32 — dtype only sets the Flax compute dtype.  The
        # dtype is stamped in coding_params, so enc/dec mismatch is
        # refused rather than silently desyncing the stream.
        dt = os.environ.get("SCP_CODEC_DTYPE", "bf16" if self.is_ehem else "f32")
        dtype = jnp.bfloat16 if dt in ("bf16", "bfloat16") else jnp.float32
        self.model = build_model(self.cfg, dtype=dtype)
        self.variables = checkpoints.load_variables(ckpt_path)
        if self.is_ehem:
            self.codec = EHEMCodec(
                self.model, self.variables, self.cfg.model.context_size
            )
        else:
            self.codec = OctAttentionCodec(self.model, self.variables)

    # -- preprocessing -----------------------------------------------------

    @staticmethod
    def _derive_grid(ref_pts, ori_file, data_type, lidar_level, system):
        """Reconstruct the QuantGrid a preprocessing run would have used
        (grid parameters depend only on the points, system and step size —
        not on the octree)."""
        from scp_tpu.core.preprocess import rotate_axes
        from scp_tpu.core.quantize import make_grid

        if data_type == "obj":
            p = ref_pts
            if any(n in ori_file for n in MVUB_NAMES):
                p = rotate_axes(p)
            return make_grid(p, system="cart", qs=1.0, offset="min")
        qs = level_qs(data_type, lidar_level)
        return make_grid(
            ref_pts,
            system=system,
            qs=qs,
            offset=(-200 if data_type == "kitti" else -(2**17))
            if system == "cart"
            else 0,
        )

    def _preproc_one(self, ori_file, data_type, lidar_level, system, morton_path=None):
        if data_type == "obj":
            # dense object clouds (MPEG/MVUB): unit grid, min offset, MVUB
            # sequences rotated to a common orientation (reference
            # encode_dataset.py:69-77, data_preprocess.py:37-39)
            rotate = any(n in ori_file for n in MVUB_NAMES)
            return preprocess_points(
                read_points(ori_file),
                system="cart",
                qs=1.0,
                offset="min",
                rotation=rotate,
            )
        qs = level_qs(data_type, lidar_level)
        return preprocess_points(
            read_points(ori_file),
            system=system,
            qs=qs,
            offset=(-200 if data_type == "kitti" else -(2**17))
            if system == "cart"
            else 0,
            morton_path=morton_path,
        )

    @staticmethod
    def _load_normals(ori_file, data_type, normals_dir):
        """Original-cloud normals for D2 PSNR (reference pt.py:68-79 feeds
        pc_error a normals ply via -n).  Looked up by stem in normals_dir
        (the layout tools/gene_normals.py produces)."""
        if not normals_dir:
            return None
        from scp_tpu.tools.gene_normals import read_normals_ply

        for cand in (Path(ori_file).stem, shard_name(ori_file, data_type)):
            p = os.path.join(normals_dir, cand + ".ply")
            if os.path.exists(p):
                _, normals = read_normals_ply(p)
                return normals
        raise FileNotFoundError(
            f"no normals ply for {ori_file!r} under {normals_dir!r}"
        )

    def preproc(
        self, ori_file, data_type, lidar_level, system, preproc_path="",
        mullevel=False, normals_dir="",
    ):
        """Returns (results list, metrics dict). Uses cached shards when a
        preproc_path is supplied (reference encode_dataset_ehem.py:126-135).
        """
        name = shard_name(ori_file, data_type)
        if preproc_path:
            base = os.path.join(preproc_path, name)
            suffixes = ["_0_0", "_0_1", "_1"] if mullevel else [""]
            ctxs = [np.load(base + s + ".npy") for s in suffixes]
            meta = np.load(base + "_meta.npy")
            ref_pts = read_points(ori_file)
            if os.path.exists(base + "_manifest.npz"):
                manifest = np.load(base + "_manifest.npz", allow_pickle=True)
                grids = [
                    QuantGrid(
                        system=str(manifest["system"]),
                        qs=manifest["qs"][i],
                        offset=manifest["offset"][i],
                        bin_num=int(manifest["bin_num"][i]),
                    )
                    for i in range(len(ctxs))
                ]
                z_offset = float(meta[2]) if len(meta) > 2 else 0.0
            else:
                # Reference-style cache (shards + `_meta.npy` only,
                # reference encode_dataset_ehem.py:126-135): rebuild the
                # grids exactly as preprocessing would, from the original
                # points + (type, level, system) (the reference re-derives
                # qs/bin_num the same way, encode_dataset_ehem.py:136-171).
                grids = [
                    self._derive_grid(
                        ref_pts, ori_file, data_type,
                        lidar_level + (j if mullevel else 0), system,
                    )
                    for j in range(len(ctxs))
                ]
                z_offset = float(grids[0].offset[2])
            results = list(zip(ctxs, grids))
            # cached-shard runs never measure PSNR (reference `_meta.npy`
            # cache stores only [bin_num, chamfer]); mark N/A as NaN so the
            # results txt can't confuse "not measured" with a measured zero
            metrics = {
                "bin_num": int(meta[0]),
                "chamfer": float(meta[1]),
                "z_offset": z_offset,
                "psnr_d1": float("nan"),
                "psnr_d2": float("nan"),
                "ref_points": ref_pts,
            }
            return results, metrics

        ref_pts = read_points(ori_file)
        results = []
        if mullevel:
            recons = []
            for j, mp in enumerate(MULLEVEL_PATHS):
                res = self._preproc_one(
                    ori_file, data_type, lidar_level + j, system, morton_path=mp
                )
                results.append((res.context, res.grid))
                recons.append(res.recon_points)
                if j == 0:
                    first = res
            recon = np.vstack(recons)
        else:
            first = self._preproc_one(ori_file, data_type, lidar_level, system)
            results.append((first.context, first.grid))
            recon = first.recon_points

        peak = PEAKS.get(data_type, 59.70)
        normals = self._load_normals(ori_file, data_type, normals_dir)
        psnr_d1, psnr_d2 = d1_d2_psnr(ref_pts, recon, peak, normals=normals)
        metrics = {
            "bin_num": first.bin_num,
            "chamfer": chamfer(ref_pts.copy(), recon.copy()),
            "z_offset": first.z_offset,
            "psnr_d1": psnr_d1,
            "psnr_d2": psnr_d2 if normals is not None else float("nan"),
            "ref_points": ref_pts,
        }
        return results, metrics

    # -- encode --------------------------------------------------------------

    def encode_file(
        self,
        ori_file,
        out_dir,
        data_type="kitti",
        lidar_level=12,
        system="spher",
        preproc_path="",
        sequential=False,
        incremental=False,
        mullevel=False,
        level_wise=True,
        normals_dir="",
    ) -> dict:
        results, metrics = self.preproc(
            ori_file, data_type, lidar_level, system, preproc_path, mullevel,
            normals_dir=normals_dir,
        )
        angular = system in ("spher", "cylin")

        oct_rans = (
            not self.is_ehem and incremental and self.codec.mode == "rans"
        )
        if self.is_ehem:
            enc = self.codec.new_stream_encoder()
        elif oct_rans:
            from scp_tpu.codec.octattn_rans import OctRansEncoder

            enc = OctRansEncoder(
                max(self.codec.max_lane_bucket(ctx) for ctx, _ in results)
            )
        else:
            enc = ac.StreamingEncoder()
        sub_sizes, mms, max_levels, lvl_sizes = [], [], [], []
        timers = [0.0]
        for ctx, _grid in results:
            if self.is_ehem:
                # deepest-level clip applied symmetrically at encode
                # (split_levels + in-program) and decode (header stamp) —
                # reference encode_dataset_ehem.py:86 / Embed(19) bound
                slices = split_levels(
                    ctx, angular=angular, lidar_level_clip=lidar_level
                )
                timers[0] += self.codec.encode_into(
                    enc, slices, lidar_clip=lidar_level
                )
                mms.append(np.array(slices.pos_mm, np.int64))
                max_levels.append(slices.max_level)
                sub_sizes.append(slices.occ_stream.shape[0])
                lvl_sizes.append(np.asarray(slices.level_sizes, np.int64))
            elif oct_rans:
                timers[0] += self.codec.encode_incremental_into(enc, ctx)
                _, syms, ml = self.codec.split_levels(ctx)
                max_levels.append(ml)
                sub_sizes.append(syms.shape[0])
                mms.append(np.zeros((ml, 2), np.int64))
                lvl_sizes.append(_level_counts(ctx, ml))
            elif incremental:
                rows, syms, t = self.codec.encode_incremental(ctx)
                timers[0] += t
                enc.append_quantized(rows, syms)
                _, _, ml = self.codec.split_levels(ctx)
                max_levels.append(ml)
                sub_sizes.append(syms.shape[0])
                mms.append(np.zeros((ml, 2), np.int64))
                lvl_sizes.append(_level_counts(ctx, ml))
            else:
                pdf, syms, t = self.codec.encode(
                    ctx, sequential=sequential, level_wise=level_wise
                )
                timers[0] += t
                enc.append(pdf, syms)
                _, _, ml = self.codec.split_levels(ctx)
                max_levels.append(ml)
                sub_sizes.append(syms.shape[0])
                mms.append(np.zeros((ml, 2), np.int64))
                lvl_sizes.append(_level_counts(ctx, ml))
        elapsed = timers[0]

        payload, bits, n_sym = EHEMCodec.finish_stream(enc)

        import jax

        header = StreamHeader(
            n_sym=int(n_sym),
            max_level=int(sum(max_levels)) if mullevel else int(max_levels[0]),
            system=system,
            bin_num=int(metrics["bin_num"]),
            z_offset=float(metrics["z_offset"]),
            lidar_clip=int(lidar_level),
            qs_rho=float(level_qs(data_type, lidar_level)),
            pos_mm=np.concatenate(mms, axis=0) if mms else np.zeros((0, 2), np.int64),
            subtree_sizes=tuple(sub_sizes),
            coding_mode=(
                self.codec.mode if self.is_ehem
                else ("rans" if oct_rans
                      else ("incr" if incremental else "full"))
            ),
            backend=jax.default_backend(),
            coding_params=(
                self.codec.coding_params() if self.is_ehem
                else self.codec.coding_params(
                    "rans" if oct_rans
                    else ("incr" if incremental else "full")
                )
            ),
            subtree_levels=tuple(max_levels),
            level_sizes=np.concatenate(lvl_sizes),
            grid_qs=np.stack(
                [np.broadcast_to(np.asarray(g.qs, np.float64), (3,)) for _, g in results]
            ),
            grid_offset=np.stack(
                [np.broadcast_to(np.asarray(g.offset, np.float64), (3,)) for _, g in results]
            ),
            grid_bin_num=np.array([g.bin_num for _, g in results], np.int64),
        )
        os.makedirs(out_dir, exist_ok=True)
        stem = shard_name(ori_file, data_type)
        binname = reference_style_name(
            stem, system, header.max_level, header.bin_num, header.z_offset
        )
        outputfile = os.path.join(out_dir, binname)
        with open(outputfile, "wb") as f:
            f.write(pack_stream(header, payload))
        # decode manifest sidecar (per-subtree grids + level maxima)
        np.savez(
            outputfile + ".manifest.npz",
            qs=np.stack([g.qs for _, g in results]),
            offset=np.stack([g.offset for _, g in results]),
            bin_num=np.array([g.bin_num for _, g in results]),
            system=system,
            max_levels=np.array(max_levels),
        )

        pt_num = metrics["ref_points"].shape[0]
        # sub_sizes counts octree nodes; n_sym counts AC steps (2 per node
        # in the staged stream format), used to size the decoder.
        oct_num = int(sum(sub_sizes))
        return {
            "outputfile": outputfile,
            "seconds": elapsed,
            "pt_num": pt_num,
            "oct_num": oct_num,
            "bits": bits,
            "bit_per_oct": bits / oct_num,
            "bpp": bits / pt_num,
            "chamfer": metrics["chamfer"],
            "psnr_d1": metrics["psnr_d1"],
            "psnr_d2": metrics.get("psnr_d2", 0.0),
        }

    # -- decode --------------------------------------------------------------

    def decode_file(
        self,
        binfile,
        out_ply=None,
        ground_truth: np.ndarray | None = None,
        sequential=False,
        incremental=False,
        level_wise=True,
    ):
        """Bitstream -> occupancy codes -> Cartesian points (+ .ply)."""
        with open(binfile, "rb") as f:
            header, payload = unpack_stream(f.read())
        import jax

        if (
            header.backend
            and header.backend != jax.default_backend()
            and not os.environ.get("SCP_ALLOW_CROSS_BACKEND")
        ):
            # Cross-backend decode is outside the determinism contract:
            # encoder and decoder must run the SAME compiled programs, and
            # XLA float math differs between backends (fusion, precision,
            # top-k tie handling) -> quantized CDFs would diverge and the
            # range coder desync.  (The reference has the same implicit
            # single-device contract, decode_ehem.py:184.)
            raise RuntimeError(
                f"bitstream was encoded on backend {header.backend!r}; "
                f"decoding on {jax.default_backend()!r} is not supported "
                "(set SCP_ALLOW_CROSS_BACKEND=1 to try anyway)"
            )
        if self.is_ehem and header.coding_mode != self.codec.mode:
            self.codec = EHEMCodec(
                self.model,
                self.variables,
                self.cfg.model.context_size,
                mode=header.coding_mode,
            )
        want_params = (
            self.codec.coding_params() if self.is_ehem
            else self.codec.coding_params(header.coding_mode)
        )
        if (
            header.coding_params
            and header.coding_params != want_params
            and not os.environ.get("SCP_ALLOW_CROSS_BACKEND")
        ):
            # same contract as the backend stamp: these knobs change the
            # compiled phase programs' float math -> CDFs -> coder sync
            raise RuntimeError(
                f"bitstream coded with {header.coding_params!r} but this "
                f"session runs {want_params!r}; set the "
                "matching SCP_* env (or SCP_ALLOW_CROSS_BACKEND=1 to try "
                "anyway)"
            )
        # Everything the decoder needs — per-subtree grids, octree depths,
        # per-level node counts — lives in the v5 header: a bare .bin is
        # decodable with no sidecar (the reference needed the filename +
        # a torch .dat; round 2 needed a .manifest.npz).
        max_levels = header.subtree_levels
        grids = header.grids()
        # the header pins the OctAttention schedule — "rans" (incremental
        # device coder), "incr" (incremental host AC), "full" (chunked
        # windows); the --incremental CLI flag is encode-side only and a
        # mismatched decode flag can no longer desync the coder
        oct_rans = not self.is_ehem and header.coding_mode == "rans"
        incremental = not self.is_ehem and header.coding_mode == "incr"
        if self.is_ehem:
            dec = self.codec.new_stream_decoder(payload, header.n_sym)
        elif oct_rans:
            from scp_tpu.codec.octattn_rans import OctRansDecoder

            dec = OctRansDecoder(payload)
        else:
            dec = ac.ArithmeticDecoder(payload, header.n_sym)

        t0 = time.time()
        parts = []
        mm_off = 0
        lvl_off = 0
        gt_off = 0
        for i, ml in enumerate(max_levels):
            ml = int(ml)
            mm = header.pos_mm[mm_off : mm_off + ml]
            mm_off += ml
            sizes_i = header.level_sizes[lvl_off : lvl_off + ml]
            lvl_off += ml
            gt = None
            if ground_truth is not None:
                gt = ground_truth[gt_off : gt_off + int(header.subtree_sizes[i])]
            gt_off += int(header.subtree_sizes[i])
            if self.is_ehem:
                codes = self.codec.decode(
                    dec,
                    ml,
                    mm,
                    angular=header.angular,
                    lidar_clip=int(header.lidar_clip),
                    ground_truth=gt,
                    level_sizes=sizes_i,
                )
            elif oct_rans:
                codes = self.codec.decode_incremental_rans(
                    dec, ml, ground_truth=gt
                )
            elif incremental:
                codes = self.codec.decode_incremental(dec, ml, ground_truth=gt)
            else:
                codes = self.codec.decode(
                    dec, ml, ground_truth=gt, sequential=sequential,
                    level_wise=level_wise,
                )
            pts = grids[i].from_grid(deoctree(codes.astype(np.int64) + 1))
            parts.append(pts)
        elapsed = time.time() - t0
        out_points = np.vstack(parts).astype(np.float32)
        if out_ply:
            write_ply(out_ply, out_points)
        return out_points, elapsed
