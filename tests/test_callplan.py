"""Invariants of the codec's static per-level call layout.

The encoder and decoder derive call plans independently from the header's
level sizes; these invariants are what keeps the two sides structurally
identical (same programs, same offsets) for ANY cloud."""

import numpy as np
import pytest

from scp_tpu.codec.ehem_codec import _call_plan, _pow2

CSZ, GROUP, SMALL = 8192, 16, 1024


@pytest.mark.parametrize(
    "n", [1, 50, 600, 1025, 8191, 8192, 8193, 9000, 24576, 31120, 90000,
          120000, 131072, 200000, 843148]
)
@pytest.mark.parametrize("mesh", [0, 8])
def test_plan_covers_contiguously(n, mesh):
    calls, padded = _call_plan(n, CSZ, GROUP, SMALL, mesh_mult=mesh)
    off = 0
    for s, lanes, width in calls:
        assert s == off, "calls must tile the level contiguously"
        assert 1 <= lanes <= GROUP
        assert SMALL <= width <= CSZ
        off += lanes * width
    assert off == padded >= n
    assert padded - n < CSZ, "at most one partial-chunk worth of padding"


def test_full_chunks_never_single_lane_when_groupable():
    # 14 full chunks must ride one 14-lane call, not a cascade
    calls, _ = _call_plan(14 * CSZ, CSZ, GROUP, SMALL)
    assert [(la, w) for _, la, w in calls] == [(14, CSZ)]


def test_mesh_mult_prefers_divisible_lane_groups():
    calls, _ = _call_plan(14 * CSZ, CSZ, GROUP, SMALL, mesh_mult=8)
    lanes = [la for _, la, w in calls]
    assert lanes[0] % 8 == 0, "first leftover group must shard"
    assert lanes == [8, 6]


def test_partial_tail_uses_smallest_covering_bucket():
    calls, _ = _call_plan(CSZ + 1500, CSZ, GROUP, SMALL)
    assert [(la, w) for _, la, w in calls] == [(1, CSZ), (1, 2048)]


def test_large_tail_merges_into_leftover_call():
    # 120k nodes = 14 full chunks + 5312 tail (> csz/2): ONE 15-lane call
    calls, _ = _call_plan(120000, CSZ, GROUP, SMALL)
    assert [(la, w) for _, la, w in calls] == [(15, CSZ)]
    # tail exactly half a chunk or less keeps its own bucketed call
    calls, _ = _call_plan(24 * CSZ + 3392, CSZ, GROUP, SMALL)
    assert [(la, w) for _, la, w in calls] == [(16, CSZ), (8, CSZ), (1, 4096)]


def test_pow2():
    assert [_pow2(v) for v in (1, 2, 3, 8, 9, 1023, 1024)] == [
        1, 2, 4, 8, 16, 1024, 1024,
    ]


# ---- narrow-bucket expansion window (round 5) ----


def _plans_for(sizes, codec_like=None):
    from scp_tpu.codec.ehem_codec import _call_plan

    TINY = 64
    plans = []
    for n in sizes:
        plans.append(([], n) if n <= TINY else _call_plan(n, CSZ, GROUP, SMALL))
    b_cap = _pow2(max(p[1] for p in plans))
    return plans, b_cap


@pytest.mark.parametrize(
    "sizes",
    [
        [1, 4, 9, 46, 265, 1232, 6517, 31207, 90025, 114937, 119172,
         119802, 119944, 119988, 119999],  # bench cloud
        [1, 8, 60, 400, 3000, 20000],
        [1, 2, 4, 8],  # all tiny
    ],
)
def test_expand_width_covers_every_consumer(sizes):
    """w must cover (a) all parent rows this expand reads and (b) every
    row the child level's phase calls or the next expand will read."""
    from scp_tpu.codec.ehem_codec import _expand_width

    plans, b_cap = _plans_for(sizes)
    for li in range(len(sizes) - 1):
        w = _expand_width(plans, b_cap, li, sizes)
        assert w <= b_cap
        assert w >= sizes[li], (li, w)          # parent reads
        assert w >= plans[li + 1][1], (li, w)   # child-level consumers
        assert w & (w - 1) == 0                 # pow2 (bounded compile count)


def test_windowed_expand_matches_full_width():
    """The windowed expand must produce byte-identical child rows within
    the window vs the full-width expand (the codec's phase calls read
    only rows < the child level's padded count <= w)."""
    import jax.numpy as jnp

    from scp_tpu.codec.ehem_codec import _expand_stream

    rng = np.random.default_rng(7)
    b_cap = 2048
    data_h = rng.integers(0, 255, (b_cap, 4, 3)).astype(np.int32)
    pos_h = rng.integers(0, 1 << 12, (b_cap, 3)).astype(np.int32)
    occ_h = rng.integers(0, 255, 4096).astype(np.uint8)
    occ = jnp.asarray(occ_h)
    # codec invariant: n_child is the TRUE child count of the parents'
    # occupancies (rows past it are pad; rows up to it have a parent)
    n_par = np.int32(100)
    n_child = np.int32(
        int(np.unpackbits(occ_h[:100] + 1, bitorder="little").sum())
    )
    lvl, unit = np.int32(5), np.int32(8)

    # the expand donates its buffers — fresh device arrays per call
    full = _expand_stream(jnp.asarray(data_h), jnp.asarray(pos_h), occ,
                          np.int32(0), n_par, n_child, lvl, unit, b_cap)
    w = 1024
    win = _expand_stream(jnp.asarray(data_h), jnp.asarray(pos_h), occ,
                         np.int32(0), n_par, n_child, lvl, unit, w)
    np.testing.assert_array_equal(np.asarray(full[0][:w]), np.asarray(win[0][:w]))
    np.testing.assert_array_equal(np.asarray(full[1][:w]), np.asarray(win[1][:w]))
