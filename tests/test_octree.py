"""Octree build / context / unbuild tests against a spec oracle.

The oracle below is written directly from the serialization spec (see
SURVEY.md §2.3 / reference Octree.py): a literal per-node construction,
deliberately different in style from the vectorized implementation.
"""

import numpy as np
import pytest

from scp_tpu.core import (
    build_octree,
    deoctree,
    gen_context,
    morton_decode,
    morton_encode,
    morton_prefix_filter,
)
from scp_tpu.core.octree import _build_from_keys_numpy


def oracle_octree(points, bits):
    """Literal BFS octree: dict-of-levels, children via explicit digits."""
    digits_per_point = []
    for p in points:
        digs = []
        for l in range(bits):
            sh = bits - 1 - l
            d = (((p[0] >> sh) & 1) << 2) | (((p[1] >> sh) & 1) << 1) | ((p[2] >> sh) & 1)
            digs.append(d)
        digits_per_point.append(tuple(digs))
    digits_per_point = sorted(set(digits_per_point))

    nodes = []  # (level, prefix tuple)
    occ, octant, parent, pos = [], [], [], []
    index_of = {}
    for level in range(1, bits + 1):
        prefixes = sorted(set(d[: level - 1] for d in digits_per_point))
        for pfx in prefixes:
            children = set(
                d[level - 1] for d in digits_per_point if d[: level - 1] == pfx
            )
            byte = 0
            for c in children:
                byte |= 1 << c
            index_of[(level, pfx)] = len(nodes)
            nodes.append((level, pfx))
            occ.append(byte)
            octant.append(1 if level == 1 else pfx[-1] + 1)
            parent.append(-1 if level == 1 else index_of[(level - 1, pfx[:-1])])
            # cell origin at full resolution
            x = y = z = 0
            for j, d in enumerate(pfx):
                w = 1 << (bits - 1 - j)
                x += ((d >> 2) & 1) * w
                y += ((d >> 1) & 1) * w
                z += (d & 1) * w
            pos.append((x, y, z))
    return (
        np.array(occ),
        np.array(octant),
        np.array(parent),
        np.array(pos),
    )


def random_cloud(rng, n, bits):
    pts = rng.integers(0, 2**bits, size=(n, 3))
    return np.unique(pts, axis=0)


@pytest.mark.parametrize("n,bits", [(1, 3), (10, 2), (100, 4), (500, 6)])
def test_build_matches_oracle(rng, n, bits):
    pts = random_cloud(rng, n, bits)
    tree = build_octree(pts, max_level=bits)
    o_occ, o_oct, o_par, o_pos = oracle_octree(pts, bits)
    np.testing.assert_array_equal(tree.occupancy, o_occ)
    np.testing.assert_array_equal(tree.octant, o_oct)
    np.testing.assert_array_equal(tree.parent, o_par)
    np.testing.assert_array_equal(tree.pos, o_pos)
    assert tree.max_level == bits


def test_morton_roundtrip(rng):
    pts = rng.integers(0, 2**21, size=(1000, 3))
    keys = morton_encode(pts)
    np.testing.assert_array_equal(morton_decode(keys, 21), pts)


def test_morton_order_is_bfs(rng):
    # Sorting by Morton key sorts by every prefix simultaneously.
    pts = random_cloud(rng, 200, 5)
    keys = np.sort(morton_encode(pts, 5))
    for l in range(1, 6):
        pref = keys >> np.uint64(3 * (5 - l))
        assert (np.diff(pref.astype(np.int64)) >= 0).all()


def test_deoctree_roundtrip(rng):
    pts = random_cloud(rng, 700, 6)
    tree = build_octree(pts)
    rec = deoctree(tree.occupancy)
    # leaves come back in sorted Morton order == the original unique points
    keys = np.sort(morton_encode(pts, tree.max_level))
    np.testing.assert_array_equal(morton_encode(rec, tree.max_level), keys)


def test_context_layout(rng):
    pts = random_cloud(rng, 300, 5)
    tree = build_octree(pts)
    ctx = gen_context(tree, k=4)
    n = tree.num_nodes
    assert ctx.shape == (n, 4, 6)
    # Row 3 is the node itself.
    np.testing.assert_array_equal(ctx[:, 3, 0], tree.occupancy)
    np.testing.assert_array_equal(ctx[:, 3, 1], tree.level)
    np.testing.assert_array_equal(ctx[:, 3, 2], tree.octant)
    np.testing.assert_array_equal(ctx[:, 3, 3:6], tree.pos)
    # Root: all ancestors missing -> occ 256, level/octant/pos 0.
    np.testing.assert_array_equal(ctx[0, :3, 0], [256, 256, 256])
    np.testing.assert_array_equal(ctx[0, :3, 1:], 0)
    # Level-2 nodes: parent row == root's own row, deeper ancestors missing.
    lvl2 = np.nonzero(tree.level == 2)[0]
    for i in lvl2[:5]:
        np.testing.assert_array_equal(ctx[i, 2], ctx[0, 3])
        assert ctx[i, 1, 0] == 256 and ctx[i, 0, 0] == 256
    # Every non-root node's ancestor rows = parent's rows shifted by one.
    for i in range(1, min(n, 200)):
        p = tree.parent[i]
        np.testing.assert_array_equal(ctx[i, :3], ctx[p, 1:4])


def test_native_matches_numpy(rng):
    from scp_tpu.native import octree_native

    if not octree_native.available():
        pytest.skip("native library unavailable")
    pts = random_cloud(rng, 5000, 8)
    keys = np.unique(morton_encode(pts, 8))
    a = octree_native.build_from_keys(keys, 8)
    b = _build_from_keys_numpy(keys, 8)
    np.testing.assert_array_equal(a.occupancy, b.occupancy)
    np.testing.assert_array_equal(a.level, b.level)
    np.testing.assert_array_equal(a.octant, b.octant)
    np.testing.assert_array_equal(a.parent, b.parent)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.level_starts, b.level_starts)


def test_morton_prefix_filter():
    pts = np.array([[0, 0, 0], [3, 1, 0], [7, 7, 7], [4, 0, 1], [2, 5, 6]])
    # bits = 3; x-prefix [0] selects x in [0, 4); [1] selects x in [4, 8).
    lo = morton_prefix_filter(pts, [0])
    hi = morton_prefix_filter(pts, [1])
    assert sorted(np.concatenate([lo, hi]).tolist()) == [0, 1, 2, 3, 4]
    assert (pts[lo][:, 0] < 4).all() and (pts[hi][:, 0] >= 4).all()
    # Two-bit path [0, 0] -> x in [0, 2).
    lolo = morton_prefix_filter(pts, [0, 0])
    assert (pts[lolo][:, 0] < 2).all()
