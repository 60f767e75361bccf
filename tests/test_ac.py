"""Arithmetic coder: roundtrips, cross-backend agreement, rate sanity."""

import numpy as np
import pytest

from scp_tpu import ac
from scp_tpu.ac.py_coder import PyDecoder, py_encode
from scp_tpu.native import ac_native


def random_pdfs(rng, n, L, concentration=0.5):
    p = rng.gamma(concentration, size=(n, L)) + 1e-9
    return p / p.sum(axis=1, keepdims=True)


def sample_syms(rng, pdfs):
    return np.array(
        [rng.choice(pdfs.shape[1], p=row) for row in pdfs], dtype=np.int16
    )


@pytest.mark.parametrize("L", [4, 255])
def test_py_roundtrip(rng, L):
    pdfs = random_pdfs(rng, 64, L)
    syms = sample_syms(rng, pdfs)
    cdf = ac.pdf_to_quantized_cdf(pdfs)
    stream = py_encode(cdf, syms)
    dec = PyDecoder(stream, len(syms))
    out = dec.decode_batch(cdf)
    np.testing.assert_array_equal(out, syms)


def test_native_available():
    assert ac_native.available(), "native coder must build in this environment"


def test_native_roundtrip_large(rng):
    pdfs = random_pdfs(rng, 5000, 255)
    syms = sample_syms(rng, pdfs)
    enc = ac.ArithmeticEncoder()
    stream, bits = enc.encode(pdfs, syms)
    assert bits == len(stream) * 8
    dec = ac.ArithmeticDecoder(stream, len(syms))
    out = dec.decode_batch(pdfs)
    np.testing.assert_array_equal(out, syms)


def test_native_matches_python_bitstream(rng):
    pdfs = random_pdfs(rng, 200, 31)
    syms = sample_syms(rng, pdfs)
    cdf = ac.pdf_to_quantized_cdf(pdfs)
    if not ac_native.available():
        pytest.skip("no native")
    assert ac_native.encode_cdf(cdf, syms) == py_encode(cdf, syms)


def test_streaming_decode_across_batches(rng):
    pdfs = random_pdfs(rng, 300, 255)
    syms = sample_syms(rng, pdfs)
    stream, _ = ac.ArithmeticEncoder().encode(pdfs, syms)
    dec = ac.ArithmeticDecoder(stream, len(syms))
    outs = [
        dec.decode_batch(pdfs[:100]),
        dec.decode_batch(pdfs[100:250]),
        dec.decode_batch(pdfs[250:]),
    ]
    np.testing.assert_array_equal(np.concatenate(outs), syms)


def test_rate_close_to_entropy(rng):
    # Sharp distributions: measured rate should be near the cross-entropy.
    pdfs = random_pdfs(rng, 4000, 255, concentration=0.05)
    syms = sample_syms(rng, pdfs)
    stream, bits = ac.ArithmeticEncoder().encode(pdfs, syms)
    ideal = -np.log2(pdfs[np.arange(len(syms)), syms] + 1e-12).sum()
    assert bits < ideal * 1.05 + 64


def test_skewed_and_deterministic_pdfs(rng):
    # Near-deterministic rows exercise tiny intervals / renormalization.
    n, L = 500, 255
    pdfs = np.full((n, L), 1e-9)
    winners = rng.integers(0, L, n)
    pdfs[np.arange(n), winners] = 1.0
    pdfs /= pdfs.sum(1, keepdims=True)
    # encode the winner for most, a miss for a few (worst case rate)
    syms = winners.astype(np.int16)
    syms[::50] = (winners[::50] + 1) % L
    stream, _ = ac.ArithmeticEncoder().encode(pdfs, syms)
    out = ac.ArithmeticDecoder(stream, n).decode_batch(pdfs)
    np.testing.assert_array_equal(out, syms)


def test_native_pdf_quantizer_matches_numpy(rng):
    """The fused C++ quantize_pdf_row must be bit-identical to the numpy
    quantizer for float32 pdfs (cross-path streams stay compatible)."""
    if not ac_native.available():
        pytest.skip("no native")
    pdfs64 = random_pdfs(rng, 300, 255)
    syms = sample_syms(rng, pdfs64)
    pdfs = pdfs64.astype(np.float32)
    # encode via fused pdf path, decode via numpy-quantized path
    enc = ac.StreamingEncoder()
    enc.append(pdfs, syms)
    stream, _ = enc.finish()
    dec = ac_native.NativeDecoder(stream, len(syms))
    out = dec.decode_batch(ac.pdf_to_quantized_cdf(pdfs))
    np.testing.assert_array_equal(out, syms)
    # and the reverse: numpy-quantized encode, fused pdf decode
    stream2 = ac_native.encode_cdf(ac.pdf_to_quantized_cdf(pdfs), syms)
    dec2 = ac_native.NativeDecoder(stream2, len(syms))
    out2 = dec2.decode_batch_pdf(pdfs)
    np.testing.assert_array_equal(out2, syms)
    assert stream == stream2


def test_check_pdf_rejects_bad_input():
    with pytest.raises(ValueError):
        ac.check_pdf(np.array([[-0.1, 1.1]]), np.array([0]))
    with pytest.raises(ValueError):
        ac.check_pdf(np.array([[0.5, 0.5]]), np.array([3]))
