"""Bitstream container: header round-trip and filename convention."""

import numpy as np
import os

import pytest

from scp_tpu.codec.bitstream import (
    StreamHeader,
    pack_stream,
    reference_style_name,
    unpack_stream,
)


def test_header_roundtrip():
    mm = np.array([[0, 100], [5, 200], [1, 300]], np.int64)
    h = StreamHeader(
        n_sym=12345,
        max_level=16,
        system="spher",
        bin_num=4096,
        z_offset=-3.0,
        lidar_clip=16,
        qs_rho=400 / 65535,
        pos_mm=mm,
        subtree_sizes=(100, 200, 300),
        subtree_levels=(2, 1, 2),
        level_sizes=np.array([1, 99, 200, 1, 299], np.int64),
        grid_qs=np.array([[0.1, 0.2, 0.3]] * 3, np.float64),
        grid_offset=np.array([[0.0, -1.5, 2.0]] * 3, np.float64),
        grid_bin_num=np.array([4096, 8192, 16384], np.int64),
    )
    payload = b"\x01\x02\x03payload"
    blob = pack_stream(h, payload)
    h2, p2 = unpack_stream(blob)
    assert p2 == payload
    assert h2.n_sym == h.n_sym
    assert h2.max_level == 16
    assert h2.system == "spher" and h2.angular
    assert h2.bin_num == 4096
    assert h2.z_offset == -3.0
    assert h2.qs_rho == pytest.approx(h.qs_rho)
    np.testing.assert_array_equal(h2.pos_mm, mm)
    assert h2.subtree_sizes == (100, 200, 300)
    assert h2.subtree_levels == (2, 1, 2)
    np.testing.assert_array_equal(h2.level_sizes, h.level_sizes)
    np.testing.assert_array_equal(h2.grid_qs, h.grid_qs)
    np.testing.assert_array_equal(h2.grid_offset, h.grid_offset)
    np.testing.assert_array_equal(h2.grid_bin_num, h.grid_bin_num)
    # the header alone must reconstruct usable dequantization grids
    grids = h2.grids()
    assert len(grids) == 3 and grids[1].bin_num == 8192
    np.testing.assert_array_equal(grids[0].qs, h.grid_qs[0])


def _minimal(**kw):
    base = dict(
        n_sym=1,
        max_level=4,
        system="cart",
        bin_num=0,
        z_offset=0.0,
        lidar_clip=12,
        qs_rho=1.0,
        pos_mm=np.zeros((0, 2), np.int64),
        subtree_sizes=(7,),
        subtree_levels=(2,),
        level_sizes=np.array([1, 6], np.int64),
        grid_qs=np.ones((1, 3)),
        grid_offset=np.zeros((1, 3)),
        grid_bin_num=np.zeros(1, np.int64),
    )
    base.update(kw)
    return StreamHeader(**base)


def test_header_cart_no_mm():
    h = _minimal()
    h2, p = unpack_stream(pack_stream(h, b""))
    assert not h2.angular and p == b""
    np.testing.assert_array_equal(h2.level_sizes, [1, 6])


def test_inconsistent_level_sizes_rejected():
    h = _minimal(level_sizes=np.array([1, 2, 3], np.int64))  # 3 != sum(levels)
    with pytest.raises(ValueError):
        pack_stream(h, b"")


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        unpack_stream(b"XXXX" + b"\x00" * 64)


def test_reference_style_name():
    assert (
        reference_style_name("scan", "spher", 16, 4096, -3)
        == "scan_spher_16_4096_-3.bin"
    )
    assert reference_style_name("scan", "cart", 12, 0, 0) == "scan_12_0_0.bin"


def test_every_inference_env_knob_is_stamped():
    """Every SCP_* env var read on the inference path changes the compiled
    phase programs, so it MUST appear in coding_params() (or a dedicated
    header field) — otherwise encoding with the knob set and decoding
    without it silently desyncs the entropy stream.  This meta-test greps
    the source so a new knob cannot be added without either stamping it or
    consciously whitelisting it here."""
    import glob
    import re

    import jax
    import numpy as np

    from scp_tpu.codec.ehem_codec import EHEMCodec
    from scp_tpu.models.ehem import EHEM

    # knobs that cannot change stream bytes:
    #   ALLOW_CROSS_BACKEND  escape hatch for the mismatch guard itself
    #   REFERENCE_DIR        baseline harness location
    #   SELFTEST_TPU         selftest device selection (backend is stamped)
    #   FUSED_EDGECONV       training forward/backward only (train=True
    #                        branch; the codec/inference path never reads it)
    #   SORT_GATHER_BWD      training backward pass only
    #   TPU_NO_NATIVE        native host coder gate; native and python
    #                        coders are byte-parity tested both directions
    #   TPU_PEAK_FLOPS/TRACE_DIR  profiling only
    #   TPU_CACHE            native-build cache directory location
    whitelist = {
        "SCP_ALLOW_CROSS_BACKEND", "SCP_REFERENCE_DIR", "SCP_SELFTEST_TPU",
        "SCP_FUSED_EDGECONV",
        "SCP_SORT_GATHER_BWD", "SCP_TPU_NO_NATIVE", "SCP_TPU_PEAK_FLOPS",
        "SCP_TRACE_DIR", "SCP_TPU_CACHE",
        # Pallas grid re-tiling only: row-identical math (the contraction
        # order inside each row never changes), and the effective value is
        # per-shape (clamped/divisor-degraded in _pick_tile/_pick_block),
        # so stamping the raw env value caused spurious decode refusals
        # between numerically identical settings (round-4 ADVICE).
        "SCP_ATTN_BLOCK", "SCP_MLP_TILE",
    }
    # env var -> stamp key in coding_params() / header field
    stamp_key = {
        "SCP_KNN_RECALL": "knn_recall=",
        "SCP_EXACT_KNN": "exact_knn=",
        "SCP_PALLAS_ATTN": "pallas_attn=",
        "SCP_PALLAS_KNN": "pallas_knn=",
        "SCP_KNN_F32": "knn_f32=",
        "SCP_NO_MSFUSE": "msfuse=",
        "SCP_NO_FUSED_MLP": "fusedmlp=",
        "SCP_NO_FUSED_ATTN": "fusedattn=",
        "SCP_NO_BNFOLD": "bnfold=",
        "SCP_CODEC_GROUP": "group=",
        "SCP_CODEC_DTYPE": "dtype=",
        "SCP_CODEC_MODE": "",  # dedicated header field: coding_mode
        "SCP_OCTATTN_CODER": "",  # dedicated header field: coding_mode
        "SCP_STATIC_KNN": "staticknn=",
        # stamped in OctAttentionCodec.coding_params (octattn streams),
        # asserted by test_octattn_coding_params_stamp below
        "SCP_OCTATTN_FUSED": "",
        "SCP_OCTRANS_CAP": "",
        # the lookup is bit-exact vs the gather, but swapping it changes
        # XLA fusion downstream (CDF rows measurably differ on chip)
        "SCP_NO_ONEHOT_EMBED": "onehotembed=",
        # same reasoning: k-major gather+max is bit-exact per node but a
        # different fusion environment for the ops around it
        "SCP_NO_KMAJOR_MAX": "kmajormax=",
    }

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set()
    for f in glob.glob(os.path.join(pkg, "scp_tpu", "**", "*.py"), recursive=True):
        with open(f) as fh:
            # DOTALL + explicit whitespace so a line break between
            # `environ.get(` and the var name (normal formatter wrapping)
            # cannot hide a knob from this audit
            seen |= set(
                re.findall(
                    r"environ[\s\S]{0,80}?['\"](SCP_[A-Z0-9_]+)['\"]", fh.read()
                )
            )
    unaccounted = seen - whitelist - set(stamp_key)
    assert not unaccounted, (
        f"env knobs {unaccounted} read in scp_tpu/ are neither stamped in "
        "coding_params() nor whitelisted as stream-neutral"
    )

    model = EHEM(
        self_depths=(2,), cross_depths=(1,), embed_dim=64, num_heads=2,
        window_size=16, mlp_ratio=2.0, knn_k=4,
    )
    d = np.zeros((1, 8, 4, 3), np.int32)
    p = np.zeros((1, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), d, p)
    stamp = EHEMCodec(model, variables, context_size=64).coding_params()
    for var, key in stamp_key.items():
        if key:
            assert key in stamp, f"{var} must stamp as {key!r}; stamp={stamp!r}"


def test_octattn_coding_params_stamp(monkeypatch):
    """OctAttention rans streams stamp the fused-schedule knobs (the fused
    level program is a different compiled program than the per-position
    chain, so a schedule mismatch between encode and decode would desync
    the coder); host-coder schedules stamp only the dtype."""
    import jax
    import numpy as np

    from scp_tpu.codec.octattn_codec import OctAttentionCodec
    from scp_tpu.models.octattention import OctAttention

    model = OctAttention(
        occ_embed_dim=8, level_embed_dim=4, octant_embed_dim=4,
        abs_pos_embed_dim=4, num_layers=1, num_heads=2, hidden_dim=32,
        context_size=16,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8, 4, 3), np.int32),
        np.zeros((1, 8, 4, 3), np.float32),
    )
    codec = OctAttentionCodec(model, variables, mode="rans")
    stamp = codec.coding_params("rans")
    assert "dtype=" in stamp and "octsched=fused" in stamp and "cap=" in stamp
    assert codec.coding_params("full") == "dtype=float32"
    assert codec.coding_params("incr") == "dtype=float32"

    monkeypatch.setenv("SCP_OCTATTN_FUSED", "0")
    codec2 = OctAttentionCodec(model, variables, mode="rans")
    s2 = codec2.coding_params("rans")
    assert "octsched=steps" in s2 and s2 != stamp
