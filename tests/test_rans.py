"""Device rANS coder: roundtrip, rate, and edge-case tests (CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scp_tpu.codec import rans
from scp_tpu.codec.ehem_codec import logits_to_cdf


def _random_rows(rng, n, sharp=3.0):
    """Quantized CDF rows from random (peaked) logits via the codec's own
    device quantizer."""
    logits = rng.normal(0.0, sharp, (max(n, 1), 255)).astype(np.float32)
    return np.asarray(logits_to_cdf(jnp.asarray(logits)))


def _ideal_bits(rows, syms):
    r = rows.astype(np.int64)
    r = np.concatenate([r, np.full((len(r), 1), 1 << 16, np.int64)], axis=1)
    r[:, 255] = np.where(r[:, 255] == 0, 1 << 16, r[:, 255])
    lo = r[np.arange(len(syms)), syms]
    hi = r[np.arange(len(syms)), syms + 1]
    return float(-np.log2((hi - lo) / 65536.0).sum())


def _roundtrip(groups, rng):
    """groups: list of (rows (n,256) u16, syms (n,)) -> decoded groups."""
    enc = rans.RansEncoder()
    for rows, syms in groups:
        n = len(syms)
        pad = rans.pad_to_chunk(n)
        rows_p = np.zeros((pad, 256), np.uint16)
        rows_p[:n] = rows
        syms_p = np.zeros(pad, np.int32)
        syms_p[:n] = syms
        sf = rans.gather_start_freq(jnp.asarray(rows_p), jnp.asarray(syms_p))
        enc.append_group(sf, n)
    payload = enc.finish()

    dec = rans.RansDecoder(payload)
    out = []
    for rows, syms in groups:
        n = len(syms)
        pad = rans.pad_to_chunk(n)
        rows_p = np.zeros((pad, 256), np.uint16)
        rows_p[:n] = rows
        got = np.asarray(dec.decode_group(jnp.asarray(rows_p), n))[:n]
        out.append(got.astype(np.int64))
    return payload, out


def test_roundtrip_multi_group_odd_sizes():
    rng = np.random.default_rng(0)
    sizes = [1, 7, rans.K_LANES - 1, rans.K_LANES, rans.K_LANES + 3,
             rans.CHUNK, rans.CHUNK + 5, 3 * rans.CHUNK + 17]
    groups = []
    for n in sizes:
        rows = _random_rows(rng, n)
        syms = rng.integers(0, 255, n)
        groups.append((rows, syms))
    _, decoded = _roundtrip(groups, rng)
    for (rows, syms), got in zip(groups, decoded):
        assert (got == syms).all()


def test_rate_close_to_ideal():
    rng = np.random.default_rng(1)
    n = 4 * rans.CHUNK + 123
    logits = rng.normal(0.0, 4.0, (n, 255)).astype(np.float32)
    rows = np.asarray(logits_to_cdf(jnp.asarray(logits)))
    # symbols drawn from the model itself -> compressible
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    syms = np.array([rng.choice(255, p=pi) for pi in p])
    payload, decoded = _roundtrip([(rows, syms)], rng)
    assert (decoded[0] == syms).all()
    ideal = _ideal_bits(rows, syms)
    actual = 8.0 * (len(payload) - 2 - 4 * rans.K_LANES)
    # interleaved rANS overhead: < 2% + small per-lane flush slack
    assert actual <= ideal * 1.02 + 64 * 8, (actual, ideal)


def test_min_freq_symbols_survive():
    """Symbols whose probability underflowed to the quantization ramp
    (freq == 1) must still roundtrip."""
    rng = np.random.default_rng(2)
    n = rans.CHUNK + 9
    logits = np.full((n, 255), -30.0, np.float32)
    logits[:, 7] = 30.0  # all mass on symbol 7
    rows = np.asarray(logits_to_cdf(jnp.asarray(logits)))
    syms = rng.integers(0, 255, n)  # encode everything, incl freq-1 tails
    _, decoded = _roundtrip([(rows, syms)], rng)
    assert (decoded[0] == syms).all()


def test_state_persists_across_groups():
    """Decoding group k must depend on having decoded k-1 (shared lane
    states) — a fresh decoder mid-stream must fail to reproduce group 2."""
    rng = np.random.default_rng(3)
    g1 = (_random_rows(rng, 500), rng.integers(0, 255, 500))
    g2 = (_random_rows(rng, 700), rng.integers(0, 255, 700))
    payload, decoded = _roundtrip([g1, g2], rng)
    assert (decoded[0] == g1[1]).all() and (decoded[1] == g2[1]).all()

    dec = rans.RansDecoder(payload)
    pad = rans.pad_to_chunk(700)
    rows_p = np.zeros((pad, 256), np.uint16)
    rows_p[:700] = g2[0]
    wrong = np.asarray(dec.decode_group(jnp.asarray(rows_p), 700))[:700]
    assert not (wrong == g2[1]).all()


def test_empty_group_skipped():
    enc = rans.RansEncoder()
    sf = jnp.zeros((rans.CHUNK, 2), jnp.uint32)
    enc.append_group(sf, 0)
    payload = enc.finish()
    assert len(payload) == 2  # no groups -> no lane states, just the count


def test_small_cloud_header_is_small():
    """Lane-state overhead must scale with the largest group, not K."""
    rng = np.random.default_rng(5)
    groups = [(_random_rows(rng, 40), rng.integers(0, 255, 40))]
    payload, decoded = _roundtrip(groups, rng)
    assert (decoded[0] == groups[0][1]).all()
    assert len(payload) < 2 + 4 * 40 + 200


def test_corrupt_payload_raises():
    with pytest.raises(ValueError):
        rans.RansDecoder(b"")  # shorter than the lane-count field
    with pytest.raises(ValueError):
        rans.RansDecoder(b"\xff\xff")  # claims more lanes than K_LANES
    with pytest.raises(ValueError):
        rans.RansDecoder(np.uint16(64).tobytes() + b"\x00" * 16)  # truncated states


def test_compact_blocks_sort_matches_searchsorted_fallback():
    """The sort-based _compact_blocks layout must be byte-identical to the
    searchsorted fallback it replaced (the fallback still serves >16 MB
    streams)."""
    import jax

    rng = np.random.default_rng(5)
    k, l = 5, 64
    blocks = rng.integers(0, 256, (k, l)).astype(np.uint8)
    totals = rng.integers(0, l + 1, k).astype(np.int32)
    packed, tot = rans._compact_blocks(jnp.asarray(blocks), jnp.asarray(totals))
    packed, tot = np.asarray(packed), int(tot)
    # reference layout computed on the host
    want = np.concatenate([blocks[i, : totals[i]] for i in range(k)])
    assert tot == totals.sum()
    assert (packed[:tot] == want).all()


def test_decoder_window_headroom_at_full_drain():
    """_decode_chunk slices a (2K+2)-byte window at ptr; with the stream
    fully drained ptr sits at len(body), so the decoder buffer must keep
    that slice in bounds even when len(body)+2K is itself a power of two
    (the old pad formula's exact boundary)."""
    rng = np.random.default_rng(6)
    n = rans.CHUNK
    rows = _random_rows(rng, n)
    syms = rng.integers(0, 255, n)
    payload, decoded = _roundtrip([(rows, syms)], rng)
    assert (decoded[0] == syms).all()
    # grow the body to land len(body) + 2*K_LANES exactly on a power of two
    used = int(np.frombuffer(payload[:2], np.uint16)[0])
    raw = len(payload) - 2 - 4 * used
    target = (1 << 21) - 2 * rans.K_LANES - raw
    if target > 0:
        padded = payload + b"\x00" * target
        dec1 = rans.RansDecoder(padded)
        assert int(dec1.stream.shape[0]) >= raw + target + 2 * rans.K_LANES + 2
        got = np.asarray(dec1.decode_group(
            jnp.asarray(np.pad(rows, ((0, rans.pad_to_chunk(n) - n), (0, 0)))), n
        ))[:n]
        assert (got == syms).all()
