"""Coordinate transform and quantization grid tests."""

import numpy as np
import pytest

from scp_tpu.core import (
    cart2cylin,
    cart2spher,
    cylin2cart,
    spher2cart,
    quantize_points,
    dequantize_points,
)
from scp_tpu.core.quantize import make_grid


def lidar_like(rng, n=2000):
    # ring-structured points resembling a LiDAR sweep
    r = rng.uniform(2.0, 80.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.4, 0.2, n)
    x = r * np.cos(el) * np.cos(az)
    y = r * np.cos(el) * np.sin(az)
    z = r * np.sin(el)
    return np.stack([x, y, z], 1)


def test_spher_roundtrip(rng):
    pts = lidar_like(rng)
    back = spher2cart(cart2spher(pts))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_cylin_roundtrip(rng):
    pts = lidar_like(rng)
    back = cylin2cart(cart2cylin(pts))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_spher_ranges(rng):
    s = cart2spher(lidar_like(rng))
    assert (s[:, 0] > 0).all()
    assert (s[:, 1] >= 0).all() and (s[:, 1] < 2 * np.pi).all()
    assert (s[:, 2] >= 0).all() and (s[:, 2] <= np.pi).all()


@pytest.mark.parametrize("system", ["cart", "cylin", "spher"])
def test_quantization_error_bounded(rng, system):
    pts = lidar_like(rng)
    qs = 400 / (2**14 - 1)
    grid = make_grid(pts, system=system, qs=qs)
    q = quantize_points(pts, grid)
    assert q.min() >= 0 or system == "cart"
    rec = dequantize_points(q, grid)
    # every original point is within a cell diagonal of some reconstruction
    from scipy.spatial import KDTree

    d, _ = KDTree(rec).query(pts, k=1)
    # angular cells grow with radius; bound by worst-case cell size at 80m
    if system == "cart":
        bound = qs * np.sqrt(3) * 0.51
    else:
        ang = 2 * np.pi / (grid.bin_num - 1)
        bound = np.sqrt((qs * 0.51) ** 2 + 2 * (80 * ang * 0.51) ** 2)
    assert d.max() <= bound * 1.5


def test_qlevel_grid(rng):
    pts = lidar_like(rng)
    grid = make_grid(pts, system="spher", qs=1.0, qlevel=12)
    q = quantize_points(pts, grid)
    assert q.max() < 2**12
    assert grid.qs[2] == grid.qs[0]  # rho/theta share step per reference


def test_grid_offsets(rng):
    pts = lidar_like(rng)
    g = make_grid(pts, system="cart", offset="min")
    q = quantize_points(pts, g)
    assert q.min() >= 0
    g2 = make_grid(pts, system="cylin", qs=0.05)
    assert g2.offset[2] == pytest.approx(cart2cylin(pts)[:, 2].min())
