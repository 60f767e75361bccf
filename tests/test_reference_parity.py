"""Byte-level parity with the reference arithmetic coder.

Skipped unless the reference repo is mounted (it is in the build
environment).  Imports the reference's torch-CPU coder at TEST time only —
it is the golden implementation for stream-format compatibility.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "numpyAc")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_numpyac():
    sys.path.insert(0, REF)
    try:
        import numpyAc  # noqa: F401  (JIT-builds its torch extension)

        return numpyAc
    except Exception as e:  # torch extension build unavailable
        pytest.skip(f"reference coder unavailable: {e}")
    finally:
        sys.path.remove(REF)


def random_case(rng, n=400, L=255, concentration=0.4):
    pdf = rng.gamma(concentration, size=(n, L)) + 1e-9
    pdf /= pdf.sum(1, keepdims=True)
    sym = (rng.random(n)[:, None] > pdf.cumsum(1)).sum(1).clip(0, L - 1)
    return pdf.astype(np.float32), sym.astype(np.int16)


def test_encoder_bitstreams_identical(rng, ref_numpyac):
    from scp_tpu import ac

    pdf, sym = random_case(rng)
    ref_stream, ref_bits = ref_numpyac.arithmeticCoding().encode(pdf, sym, None)
    mine, bits = ac.ArithmeticEncoder().encode(pdf, sym)
    assert bits == ref_bits
    assert mine == ref_stream


def test_our_decoder_reads_reference_stream(rng, ref_numpyac):
    from scp_tpu import ac

    pdf, sym = random_case(rng, n=300)
    ref_stream, _ = ref_numpyac.arithmeticCoding().encode(pdf, sym, None)
    out = ac.ArithmeticDecoder(ref_stream, len(sym)).decode_batch(pdf)
    np.testing.assert_array_equal(out, sym)


def test_reference_decoder_reads_our_stream(rng, ref_numpyac):
    from scp_tpu import ac

    pdf, sym = random_case(rng, n=200)
    mine, _ = ac.ArithmeticEncoder().encode(pdf, sym)
    dec = ref_numpyac.arithmeticDeCoding(mine, len(sym), 255, None)
    out = dec.decode_ehem(pdf)
    np.testing.assert_array_equal(np.asarray(out, np.int16), sym)
