"""Convolutional FEC (CCSDS K=7 r=1/2): encoder vectors, Viterbi
roundtrip, error correction, soft-decision gain."""

import numpy as np
import pytest

from pycusdr_tpu.ops.viterbi import conv_encode, viterbi_decode


def test_clean_roundtrip():
    rng = np.random.RandomState(0)
    for n in [10, 100, 1000]:
        bits = rng.randint(0, 2, n).astype(np.uint8)
        sym = conv_encode(bits)
        assert len(sym) == 2 * (n + 6)
        dec = viterbi_decode(sym, n_bits=n)
        np.testing.assert_array_equal(dec, bits)


def test_corrects_hard_errors():
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, 2000).astype(np.uint8)
    sym = conv_encode(bits).astype(np.uint8)
    flip = rng.rand(len(sym)) < 0.04  # 4% channel symbol errors
    sym = sym ^ flip.astype(np.uint8)
    dec = viterbi_decode(sym, n_bits=2000)
    ber = np.mean(dec != bits)
    assert ber < 0.001, f"hard-decision BER {ber}"


def test_soft_beats_hard():
    rng = np.random.RandomState(2)
    bits = rng.randint(0, 2, 4000).astype(np.uint8)
    sym = conv_encode(bits).astype(np.float32)
    # AWGN on ±1 symbols at an SNR where hard decisions start failing
    x = sym * 2 - 1
    noisy = x + 0.8 * rng.randn(len(x)).astype(np.float32)
    hard = (noisy > 0).astype(np.uint8)

    dec_h = viterbi_decode(hard, n_bits=4000)
    dec_s = viterbi_decode(noisy, n_bits=4000, soft=True)
    ber_h = np.mean(dec_h != bits)
    ber_s = np.mean(dec_s != bits)
    assert ber_s < ber_h, f"soft {ber_s} should beat hard {ber_h}"
    assert ber_s < 0.01  # ~11% raw symbol errors fully cleaned up


def test_known_encoder_vector():
    # K=7 (171, 133): the first encoded pair of input 1 from the zero
    # state must be G-parities of register 0b1
    sym = conv_encode(np.array([1], np.uint8), invert_g2=False)
    assert (sym[0], sym[1]) == (1, 1)  # both polys have the LSB tap
    sym0 = conv_encode(np.array([0], np.uint8), invert_g2=False)
    assert (sym0[0], sym0[1]) == (0, 0)


def test_inversion_flag():
    bits = np.array([1, 0, 1, 1, 0], np.uint8)
    a = conv_encode(bits, invert_g2=True)
    b = conv_encode(bits, invert_g2=False)
    np.testing.assert_array_equal(a[0::2], b[0::2])  # G1 stream equal
    np.testing.assert_array_equal(a[1::2] ^ 1, b[1::2])  # G2 inverted
    dec = viterbi_decode(a, n_bits=5, invert_g2=True)
    np.testing.assert_array_equal(dec, bits)


def test_stream_chunked_matches_oneshot():
    """Feeding chunks through ViterbiStream reproduces the one-shot
    decode (modulo the traceback-margin tail still held back)."""
    from pycusdr_tpu.ops.viterbi import ViterbiStream, conv_encode, viterbi_decode

    rng = np.random.RandomState(10)
    bits = rng.randint(0, 2, 4000).astype(np.uint8)
    sym = conv_encode(bits).astype(np.float32)
    flip = rng.rand(len(sym)) < 0.03
    sym = np.abs(sym - flip)

    oneshot = viterbi_decode(sym, n_bits=4000)

    vs = ViterbiStream()
    out = []
    pos = 0
    for chunk_len in [700, 1300, 900, 2100, 1500, 1512]:
        out.append(vs.feed(sym[pos : pos + chunk_len]))
        pos += chunk_len
    assert pos == len(sym)
    streamed = np.concatenate(out)

    n = min(len(streamed), 4000)
    assert n >= 4000 - 128  # only the final margin may be held back
    np.testing.assert_array_equal(streamed[:n], oneshot[:n])


def test_stream_node_sync_recovery():
    """A stream starting mid-pair (odd symbol offset) still decodes:
    node sync picks the correct parity from the path metric."""
    from pycusdr_tpu.ops.viterbi import ViterbiStream, conv_encode

    rng = np.random.RandomState(11)
    bits = rng.randint(0, 2, 3000).astype(np.uint8)
    sym = conv_encode(bits).astype(np.float32)
    # drop the first symbol: every subsequent pair is misaligned
    sym_off = sym[1:]

    vs = ViterbiStream()
    out = np.concatenate([vs.feed(sym_off[:2500]), vs.feed(sym_off[2500:])])
    assert vs.parity == 1
    # with parity 1 the decoder sees bits[1:]: require a long exact run
    ref = bits[1:]
    n = min(len(out), len(ref))
    assert n > 2500
    errs = int(np.sum(out[:n] != ref[:n]))
    assert errs == 0, f"{errs} errors after node-sync recovery"


def test_soft_erasures_beat_hard_decisions():
    """15% erased bits (value garbage, trust < 0) + 2% flips elsewhere:
    soft decode with erasure weights recovers; hard decode cannot."""
    from pycusdr_tpu.ops.viterbi import conv_encode, viterbi_decode

    rng = np.random.RandomState(12)
    bits = rng.randint(0, 2, 2000).astype(np.uint8)
    sym = conv_encode(bits)

    erased = rng.rand(len(sym)) < 0.15
    flipped = (rng.rand(len(sym)) < 0.02) & ~erased
    hard = sym.copy()
    hard[erased] = rng.randint(0, 2, int(erased.sum()))  # garbage
    hard = hard ^ flipped.astype(np.uint8)

    soft = (hard.astype(np.float32) * 2 - 1)
    soft[erased] = 0.0  # trust<0 -> erasure

    dec_soft = viterbi_decode(soft, n_bits=2000, soft=True)
    err_soft = int(np.sum(dec_soft != bits))
    dec_hard = viterbi_decode(hard, n_bits=2000)
    err_hard = int(np.sum(dec_hard != bits))
    assert err_soft == 0, f"soft decode left {err_soft} errors"
    assert err_hard > err_soft  # erasure knowledge must help


def test_stream_soft_chunked_matches_oneshot():
    """Soft-decision streaming: chunked erasure-weighted feed matches
    the one-shot soft decode."""
    from pycusdr_tpu.ops.viterbi import ViterbiStream, conv_encode, viterbi_decode

    rng = np.random.RandomState(13)
    bits = rng.randint(0, 2, 3000).astype(np.uint8)
    sym = conv_encode(bits).astype(np.float32) * 2 - 1
    erased = rng.rand(len(sym)) < 0.10
    sym[erased] = 0.0
    flip = (rng.rand(len(sym)) < 0.02) & ~erased
    sym[flip] *= -1

    oneshot = viterbi_decode(sym, n_bits=3000, soft=True)

    vs = ViterbiStream(soft=True)
    out = []
    pos = 0
    for chunk in [900, 1400, 1100, 1700, 912]:
        out.append(vs.feed(sym[pos : pos + chunk]))
        pos += chunk
    assert pos == len(sym)
    streamed = np.concatenate(out)
    n = min(len(streamed), 3000)
    assert n >= 3000 - 128
    np.testing.assert_array_equal(streamed[:n], oneshot[:n])
    assert vs.parity == 0  # no spurious resync on a clean soft stream
