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
