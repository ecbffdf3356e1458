"""Sharded (channel x dopp) demod and time-sharded halo streaming must
reproduce the single-chip block graph bit-for-bit on an 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from pycusdr_tpu.dsp.block import build_process_block
from pycusdr_tpu.parallel import (
    build_sharded_demod_step,
    build_time_sharded_stream,
    make_mesh,
)

from conftest import make_fsk_signal
from pycusdr_tpu.ops.cfft import c2ri


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as g

    return g.tiny_spec()


def _fsk_blocks(spec, n_chan, seed=3):
    rng = np.random.RandomState(seed)
    nbits = spec.Nfft // int(spec.spsym)
    bits = rng.randint(0, 2, nbits)
    offset = spec.centreFreqOffset / spec.sampleRate
    blocks = np.stack(
        [
            make_fsk_signal(bits, int(spec.spsym), offset, seed=seed + c, noise_std=0.1)
            for c in range(n_chan)
        ]
    )
    return bits, blocks


def test_sharded_step_matches_single_chip(tiny):
    mesh = make_mesh({"channel": 4, "dopp": 2})
    step = build_sharded_demod_step(tiny, mesh)
    _, blocks = _fsk_blocks(tiny, 4)

    res = step(c2ri(blocks))
    single = build_process_block(tiny, jit=True)

    for c in range(4):
        ref = {k: np.asarray(v) for k, v in single(c2ri(blocks[c])).items()}
        n = int(ref["nBits"])
        np.testing.assert_array_equal(
            np.asarray(res["bits"])[c, :n], ref["bits"][:n], err_msg=f"chan {c}"
        )
        np.testing.assert_array_equal(np.asarray(res["symbols"])[c, :n], ref["symbols"][:n])
        np.testing.assert_array_equal(np.asarray(res["centres"])[c, :n], ref["centres"][:n])
        assert abs(float(res["spSym"][c]) - float(ref["spSym"])) < 1e-3
        assert abs(float(res["doppler_hz"][c]) - float(ref["doppler_hz"])) < 1.0

    # all channels carry the same bits -> the vote must agree with ch 0
    n = int(np.asarray(res["nSym"])[0])
    np.testing.assert_array_equal(
        np.asarray(res["bits_voted"])[:n], np.asarray(res["bits"])[0, :n]
    )


def test_channel_only_mesh_specialization_matches(tiny):
    """nd == 1 takes the vmapped single-chip-graph fast path (the
    common pure-channel-parallel deployment); it must be bit-identical
    to the single-chip graph AND make the same vote decision as the
    generic channel x dopp program."""
    mesh1 = make_mesh({"channel": 4, "dopp": 1})
    mesh2 = make_mesh({"channel": 4, "dopp": 2})
    step1 = build_sharded_demod_step(tiny, mesh1)
    step2 = build_sharded_demod_step(tiny, mesh2)
    _, blocks = _fsk_blocks(tiny, 4)

    r1 = step1(c2ri(blocks))
    r2 = step2(c2ri(blocks))
    single = build_process_block(tiny, jit=True)

    for c in range(4):
        ref = {k: np.asarray(v) for k, v in single(c2ri(blocks[c])).items()}
        n = int(ref["nBits"])
        for k in ("bits", "symbols", "centres"):
            np.testing.assert_array_equal(
                np.asarray(r1[k])[c, :n], ref[k][:n],
                err_msg=f"chan {c} {k} (fast path vs single-chip)")
            np.testing.assert_array_equal(
                np.asarray(r1[k])[c, :n], np.asarray(r2[k])[c, :n],
                err_msg=f"chan {c} {k} (fast path vs generic mesh)")
        assert abs(float(r1["spSym"][c]) - float(ref["spSym"])) < 1e-3

    n = int(np.asarray(r1["nBits"])[0])
    np.testing.assert_array_equal(np.asarray(r1["bits_voted"])[:n],
                                  np.asarray(r2["bits_voted"])[:n])


def test_time_sharded_stream_matches_serial(tiny):
    n_dev = 8
    mesh = make_mesh({"time": n_dev})
    stream = build_time_sharded_stream(tiny, mesh)

    N, ov = tiny.Nfft, tiny.sigOverlap
    hop = N - ov
    rng = np.random.RandomState(7)
    nbits = (ov + hop * n_dev) // int(tiny.spsym) + 8
    bits = rng.randint(0, 2, nbits)
    offset = tiny.centreFreqOffset / tiny.sampleRate
    sig = make_fsk_signal(bits, int(tiny.spsym), offset, seed=9, noise_std=0.05)

    carry = c2ri(sig[:ov])
    new = c2ri(sig[ov : ov + hop * n_dev].reshape(n_dev, hop))

    res, carry_out = stream(new, carry)
    np.testing.assert_array_equal(np.asarray(carry_out), new[-1, :, hop - ov :])

    single = build_process_block(tiny, jit=True)
    for t in range(n_dev):
        block = sig[t * hop : t * hop + N]
        ref = {k: np.asarray(v) for k, v in single(c2ri(block)).items()}
        n = int(ref["nBits"])
        np.testing.assert_array_equal(
            np.asarray(res["bits"])[t, :n], ref["bits"][:n], err_msg=f"block {t}"
        )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_step_bpsk_nrzs(tiny):
    """NRZ-S (BPSK) transition-LUT bit extraction under mask sharding
    must match the single-chip path."""
    import dataclasses

    import __graft_entry__ as g
    from pycusdr_tpu.dsp.signal_gen import modulate_bpsk
    from pycusdr_tpu.dsp.spec import build_spec
    from pycusdr_tpu.protocol import loadProtocol

    conf = g._conf(blockSize=9, overlap=7, spsym=8, doppSteps=16, windowWidth=5,
                   maskSize=4)  # bench_BPSK defines NRZ-S LUTs for maskLen 4/5
    conf["Main"]["protocols"] = {"UHF": "bench_BPSK"}
    protocol = loadProtocol("bench_BPSK")(conf=conf)
    spec = build_spec(conf, protocol, "UHF-H")
    assert spec.bitLUT is None and spec.symbolLUT is not None

    rng = np.random.RandomState(12)
    nbits = spec.Nfft // int(spec.spsym)
    bits = rng.randint(0, 2, nbits)
    nb = modulate_bpsk(bits, int(spec.spsym))
    n = np.arange(len(nb))
    offs = spec.centreFreqOffset / spec.sampleRate
    base_sig = (nb * np.exp(2j * np.pi * offs * n)).astype(np.complex64)
    blocks = np.stack([
        (base_sig + (0.02 * (np.random.RandomState(20 + c).randn(len(base_sig))
                             + 1j * np.random.RandomState(40 + c).randn(len(base_sig))))
         ).astype(np.complex64)[: spec.Nfft]
        for c in range(4)
    ])

    mesh = make_mesh({"channel": 4, "dopp": 2})
    step = build_sharded_demod_step(spec, mesh)
    res = step(c2ri(blocks))

    single = build_process_block(spec, jit=True)
    for c in range(4):
        ref = {k: np.asarray(v) for k, v in single(c2ri(blocks[c])).items()}
        nb_ = int(ref["nBits"])
        np.testing.assert_array_equal(
            np.asarray(res["bits"])[c, :nb_], ref["bits"][:nb_], err_msg=f"chan {c}"
        )
        np.testing.assert_array_equal(
            np.asarray(res["trust"])[c, :nb_], ref["trust"][:nb_], err_msg=f"trust {c}"
        )


def test_device_vote_pins_wrong_master_case():
    """Device-path counterpart of test_combine.py's two-slave
    wrong-master pin: with 2 agreeing channels against the master, the
    majority must win, and combined trust uses the positive-good
    convention (agreed + quorum/10; -1 only when no voter qualifies)."""
    from pycusdr_tpu.parallel.vote import vote_n_device

    truth = np.ones(8, np.int8)
    master = np.zeros(8, np.int8)  # wrong everywhere
    bits = np.stack([master, truth, truth])
    trust = np.full((3, 8), 2, np.int8)
    voted, t = vote_n_device(bits, trust)
    np.testing.assert_array_equal(np.asarray(voted), truth)
    np.testing.assert_allclose(np.asarray(t), 2.3)

    # all channels disqualified -> trust -1 (erasure), never +1
    trust_bad = np.full((3, 8), -1, np.int8)
    _, t_bad = vote_n_device(bits, trust_bad)
    np.testing.assert_allclose(np.asarray(t_bad), -1.0)


def test_sharded_step_mask_offset_fallback(tiny):
    """CODE_SEARCH_MASK_OFFSET > 0 forces the generic program onto the
    P2 fallback (the fused subset sum needs static local bounds); its
    bits must still match the single-chip graph exactly."""
    import dataclasses

    spec = dataclasses.replace(tiny, code_search_mask_offset=1)
    mesh = make_mesh({"channel": 2, "dopp": 2})
    step = build_sharded_demod_step(spec, mesh)
    _, blocks = _fsk_blocks(spec, 2, seed=6)

    res = step(c2ri(blocks))
    single = build_process_block(spec, jit=True)
    for c in range(2):
        ref = {k: np.asarray(v) for k, v in single(c2ri(blocks[c])).items()}
        n = int(ref["nBits"])
        np.testing.assert_array_equal(
            np.asarray(res["bits"])[c, :n], ref["bits"][:n],
            err_msg=f"mask-offset fallback chan {c}")
        assert abs(float(res["spSym"][c]) - float(ref["spSym"])) < 1e-3


def test_sharded_force_generic_matches_fast_path(tiny):
    """force_generic on a channel-only mesh must produce the same bits
    as the nd==1 fast path (the A/B the per-chip bench relies on)."""
    mesh = make_mesh({"channel": 4, "dopp": 1})
    fast = build_sharded_demod_step(tiny, mesh)
    gen = build_sharded_demod_step(tiny, mesh, force_generic=True)
    _, blocks = _fsk_blocks(tiny, 4, seed=9)

    ra = fast(c2ri(blocks))
    rb = gen(c2ri(blocks))
    for c in range(4):
        n = int(np.asarray(ra["nBits"])[c])
        np.testing.assert_array_equal(
            np.asarray(ra["bits"])[c, :n], np.asarray(rb["bits"])[c, :n],
            err_msg=f"force_generic chan {c}")
