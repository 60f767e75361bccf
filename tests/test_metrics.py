"""D1/D2 PSNR, Chamfer, and normal estimation tests."""

import numpy as np
import pytest

from scp_tpu.metrics import chamfer, d1_d2_psnr, estimate_normals


def test_identical_clouds_infinite_psnr(rng):
    pts = rng.random((500, 3)) * 10
    d1, _ = d1_d2_psnr(pts, pts.copy(), peak=59.70)
    assert d1 == float("inf")
    assert chamfer(pts.copy(), pts.copy()) == 0.0


def test_known_shift_psnr(rng):
    pts = rng.random((2000, 3)) * 100
    eps = 0.01
    shifted = pts + np.array([eps, 0, 0])
    # dense-enough cloud that some NNs are not the shifted twin is avoided
    # by using a sparse grid
    grid = np.stack(np.meshgrid(*[np.arange(10) * 5.0] * 3), -1).reshape(-1, 3)
    shifted = grid + np.array([eps, 0, 0])
    d1, _ = d1_d2_psnr(grid, shifted, peak=59.70)
    expected = 10 * np.log10(3 * 59.70**2 / eps**2)
    assert d1 == pytest.approx(expected, abs=1e-6)


def test_chamfer_symmetric_max(rng):
    a = np.zeros((10, 3))
    b = np.ones((10, 3))  # every NN distance = sqrt(3)
    assert chamfer(a, b) == pytest.approx(np.sqrt(3.0))


def test_d2_plane(rng):
    # points on z=0 plane, reconstruction offset in z: D2 error == offset^2
    n = 400
    plane = np.column_stack([rng.random(n) * 10, rng.random(n) * 10, np.zeros(n)])
    rec = plane + np.array([0.05, 0.0, 0.2])
    normals = np.tile(np.array([0.0, 0.0, 1.0]), (n, 1))
    d1, d2 = d1_d2_psnr(plane, rec, peak=59.70, normals=normals)
    expected_d2 = 10 * np.log10(3 * 59.70**2 / 0.2**2)
    assert d2 == pytest.approx(expected_d2, rel=1e-3)
    assert d2 > d1  # plane projection removes in-plane error


def test_estimate_normals_plane(rng):
    n = 500
    plane = np.column_stack(
        [rng.random(n) * 10 - 5, rng.random(n) * 10 - 5, np.full(n, 3.0)]
    )
    normals = estimate_normals(plane, k=12)
    # all normals close to +-z, oriented toward origin (i.e., -z here since
    # the plane sits at z=3 and the sensor is at 0)
    assert np.abs(normals[:, 2]).min() > 0.99
    assert (normals[:, 2] < 0).all()
