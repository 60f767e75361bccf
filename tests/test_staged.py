"""Staged (two-nibble) entropy coding: exactness, parity, and rate tests.

The staged factorization (codec/staged.py) must (a) roundtrip losslessly,
(b) produce byte-identical streams whether encoded from pre-gathered
intervals or from the full CDF rows (the intervals ARE gathers of those
rows), and (c) cost essentially the same rate as the round-1 single-stage
255-way coding.
"""

import numpy as np
import pytest

from scp_tpu import ac
from scp_tpu.ac.py_coder import PyDecoder, PyEncoder
from scp_tpu.codec.staged import (
    staged_bits_np,
    staged_cdfs_np,
)
from scp_tpu.native import ac_native


def _peaked_logits(rng, n, scale=4.0):
    """Random logits with a dominant symbol — trained-model-like."""
    x = rng.normal(0, 1, (n, 255)).astype(np.float32)
    peaks = rng.integers(0, 255, n)
    x[np.arange(n), peaks] += scale
    return x


def _syms_from_logits(rng, logits):
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.array(
        [rng.choice(255, p=row) for row in p], dtype=np.int64
    )


def _host_intervals(hi_cdf, cond_cdf, syms):
    hi, lo = syms >> 4, syms & 15
    n = syms.shape[0]
    iv = np.zeros((n, 2, 2), np.uint16)
    rows = cond_cdf[np.arange(n), hi]
    iv[:, 0, 0] = hi_cdf[np.arange(n), hi]
    iv[:, 0, 1] = hi_cdf[np.arange(n), hi + 1]
    iv[:, 1, 0] = rows[np.arange(n), lo]
    iv[:, 1, 1] = rows[np.arange(n), lo + 1]
    return iv


def test_staged_roundtrip_and_interval_row_equivalence(rng):
    n = 300
    logits = _peaked_logits(rng, n)
    syms = _syms_from_logits(rng, logits)
    hi_cdf, cond_cdf = staged_cdfs_np(logits)
    hi, lo = syms >> 4, syms & 15

    # stream A: from pre-gathered intervals (hi block then lo block)
    iv = _host_intervals(hi_cdf, cond_cdf, syms)
    enc = ac.StreamingEncoder()
    enc.append_intervals(iv[:, 0])
    enc.append_intervals(iv[:, 1])
    stream_a, bits = enc.finish()

    # stream B: from the full CDF rows + symbols
    enc2 = ac.StreamingEncoder()
    enc2.append_quantized(hi_cdf, hi.astype(np.int16))
    rows = cond_cdf[np.arange(n), hi]
    enc2.append_quantized(rows, lo.astype(np.int16))
    stream_b, _ = enc2.finish()
    assert stream_a == stream_b

    # decode: hi stage against hi rows, lo stage against gathered rows
    dec = ac.ArithmeticDecoder(stream_a, 2 * n)
    got_hi = dec.decode_batch_quantized(hi_cdf)
    np.testing.assert_array_equal(got_hi, hi)
    got_lo = dec.decode_batch_quantized(cond_cdf[np.arange(n), got_hi])
    np.testing.assert_array_equal(got_lo, lo)
    np.testing.assert_array_equal(got_hi * 16 + got_lo, syms)

    # rate sanity: actual bits within a byte-ish of the ideal staged bits
    ideal = staged_bits_np(hi_cdf, cond_cdf, syms)
    assert bits <= ideal + 64


def test_staged_rate_matches_single_stage(rng):
    """P(hi)*P(lo|hi) == P(sym): staged rate ~= 255-way single-stage rate."""
    n = 400
    logits = _peaked_logits(rng, n, scale=5.0)
    syms = _syms_from_logits(rng, logits)

    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    stream_full, bits_full = ac.ArithmeticEncoder().encode(
        p.astype(np.float32), syms.astype(np.int16)
    )

    hi_cdf, cond_cdf = staged_cdfs_np(logits)
    iv = _host_intervals(hi_cdf, cond_cdf, syms)
    enc = ac.StreamingEncoder()
    enc.append_intervals(iv.reshape(-1, 2))
    _, bits_staged = enc.finish()

    assert abs(bits_staged - bits_full) / bits_full < 0.02


def test_staged_device_matches_numpy_gathers(rng):
    """jit intervals()/gather_cond_rows() are pure integer gathers — they
    must agree exactly with the host gathers on identical uint16 inputs."""
    import jax

    from scp_tpu.codec.staged import gather_cond_rows, intervals

    n = 64
    logits = _peaked_logits(rng, n)
    syms = _syms_from_logits(rng, logits)
    hi_cdf, cond_cdf = staged_cdfs_np(logits)

    iv_dev = np.asarray(jax.jit(intervals)(hi_cdf, cond_cdf, syms.astype(np.int32)))
    np.testing.assert_array_equal(iv_dev, _host_intervals(hi_cdf, cond_cdf, syms))

    hi = (syms >> 4).astype(np.int32)
    rows_dev = np.asarray(jax.jit(gather_cond_rows)(cond_cdf, hi))
    np.testing.assert_array_equal(rows_dev, cond_cdf[np.arange(n), hi])


@pytest.mark.skipif(not ac_native.available(), reason="no native coder")
def test_py_native_interval_parity(rng):
    n = 200
    logits = _peaked_logits(rng, n)
    syms = _syms_from_logits(rng, logits)
    hi_cdf, cond_cdf = staged_cdfs_np(logits)
    iv4 = _host_intervals(hi_cdf, cond_cdf, syms)
    iv = np.concatenate([iv4[:, 0], iv4[:, 1]])  # hi block then lo block

    native = ac_native.NativeEncoder()
    native.append_intervals(iv)
    s_native = native.finish()

    py = PyEncoder()
    py.append_intervals(iv)
    s_py = py.finish()
    assert s_native == s_py

    # py decoder reads the native stream
    dec = PyDecoder(s_native, 2 * n)
    got_hi = dec.decode_batch(hi_cdf)
    np.testing.assert_array_equal(got_hi, syms >> 4)


def test_degenerate_conditionals_still_code(rng):
    """Underflowed softmax rows (all-zero conditionals) degrade to the
    quantization ramp and every symbol stays encodable."""
    logits = np.full((8, 255), -1e9, np.float32)
    logits[:, 0] = 0.0  # all mass on symbol 0 -> rows 1..15 underflow
    syms = np.array([0, 17, 42, 100, 200, 254, 33, 250], np.int64)
    hi_cdf, cond_cdf = staged_cdfs_np(logits)
    assert np.isfinite(hi_cdf.astype(np.float64)).all()
    iv = _host_intervals(hi_cdf, cond_cdf, syms)
    enc = ac.StreamingEncoder()
    enc.append_intervals(iv[:, 0])
    enc.append_intervals(iv[:, 1])
    stream, _ = enc.finish()
    dec = ac.ArithmeticDecoder(stream, 2 * len(syms))
    got_hi = dec.decode_batch_quantized(hi_cdf)
    got_lo = dec.decode_batch_quantized(cond_cdf[np.arange(len(syms)), got_hi])
    np.testing.assert_array_equal(got_hi * 16 + got_lo, syms)
