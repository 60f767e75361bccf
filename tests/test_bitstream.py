"""Bitstream container: header round-trip and filename convention."""

import numpy as np
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
