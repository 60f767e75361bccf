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


def test_header_cart_no_mm():
    h = StreamHeader(
        n_sym=1, max_level=4, system="cart", bin_num=0, z_offset=0.0,
        lidar_clip=12, qs_rho=1.0, pos_mm=np.zeros((0, 2), np.int64),
    )
    h2, p = unpack_stream(pack_stream(h, b""))
    assert not h2.angular and p == b""


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        unpack_stream(b"XXXX" + b"\x00" * 64)


def test_reference_style_name():
    assert (
        reference_style_name("scan", "spher", 16, 4096, -3)
        == "scan_spher_16_4096_-3.bin"
    )
    assert reference_style_name("scan", "cart", 12, 0, 0) == "scan_12_0_0.bin"
