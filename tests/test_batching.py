"""Batched streaming (processMany): one vmapped dispatch over K hops
must produce exactly the same bit stream as the per-block API."""

import numpy as np

from pycusdr_tpu.models import UHF
from pycusdr_tpu.protocol import loadProtocol

from conftest import make_fsk_signal


def test_process_many_matches_sequential(bench_conf):
    protocol = loadProtocol("bench_FSK")(conf=bench_conf)
    dA = UHF.Demodulator(bench_conf, protocol, "UHF-H")
    dB = UHF.Demodulator(bench_conf, protocol, "UHF-H")

    N, ov = dA.Nfft, dA.sigOverlap
    hop = N - ov
    K = 6
    rng = np.random.RandomState(3)
    nbits = (ov + hop * K) // 16 + 8
    bits = rng.randint(0, 2, nbits)
    sig = make_fsk_signal(bits, 16, 38400 / dA.spec.sampleRate, seed=4, noise_std=0.05)
    sig = np.r_[sig, np.zeros(hop * K, np.complex64)][: hop * K]
    hops = sig.reshape(K, hop)

    # A: per-block streaming
    rawA = dA.get_signalBufferHostPointer()
    seqA = []
    for i in range(K):
        rawA[ov:] = hops[i]
        dA.uploadAndFindCarrier(rawA)
        b, _, t, _ = dA.demodulate()
        seqA.append((b, t))
        rawA[:ov] = rawA[-ov:]

    # B: batched (3 + 3)
    seqB = []
    for chunk in (hops[:3], hops[3:]):
        for res in dB.processMany(chunk):
            seqB.append((res["bits"], res["trust"]))

    assert len(seqA) == len(seqB) == K
    for i, ((ba, ta), (bb, tb)) in enumerate(zip(seqA, seqB)):
        np.testing.assert_array_equal(ba, bb, err_msg=f"bits differ at block {i}")
        np.testing.assert_array_equal(ta, tb, err_msg=f"trust differs at block {i}")


def test_sigfifo_getblocks_drains_backlog():
    import threading
    import time

    import zmq

    from pycusdr_tpu.runtime.sigfifo import SigFIFO

    ctx = zmq.Context()
    pub = ctx.socket(zmq.PUB)
    pub.bind("tcp://127.0.0.1:32560")
    fifo = SigFIFO("tcp://127.0.0.1:32560", 1000, timeoutRetries=50)
    time.sleep(0.5)

    data = np.arange(3500).astype(np.complex64)
    for pos in range(0, 3500, 700):
        pub.send(data[pos : pos + 700].tobytes())
    time.sleep(0.3)

    blocks = fifo.getBlocks(4)
    assert len(blocks) == 3  # 3500 samples -> 3 full hops buffered
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got, data[:3000])
    pub.close()
    ctx.term()


def test_scan_stream_matches_sequential(bench_conf):
    """The on-device lax.scan capture processor equals per-block calls."""
    import jax

    from pycusdr_tpu.dsp.block import build_process_block, build_process_stream
    from pycusdr_tpu.dsp.spec import build_spec
    from pycusdr_tpu.ops.cfft import c2ri

    protocol = loadProtocol("bench_FSK")(conf=bench_conf)
    spec = build_spec(bench_conf, protocol, "UHF-H")
    N, ov = spec.Nfft, spec.sigOverlap
    hop = N - ov
    K = 5
    rng = np.random.RandomState(8)
    bits = rng.randint(0, 2, (ov + hop * K) // 16 + 8)
    sig = make_fsk_signal(bits, 16, 38400 / spec.sampleRate, seed=5, noise_std=0.05)
    sig = np.r_[sig, np.zeros(hop * K + ov, np.complex64)]

    stream = build_process_stream(spec)
    carry = c2ri(sig[:ov])
    hops = np.stack([c2ri(sig[ov + i * hop : ov + (i + 1) * hop]) for i in range(K)])
    res, carry_out = stream(hops, carry)

    single = build_process_block(spec, jit=True)
    for i in range(K):
        block = sig[i * hop : i * hop + N]
        ref = {k: np.asarray(v) for k, v in single(c2ri(block)).items()}
        n = int(ref["nBits"])
        np.testing.assert_array_equal(np.asarray(res["bits"])[i, :n], ref["bits"][:n],
                                      err_msg=f"scan block {i}")
    np.testing.assert_allclose(np.asarray(carry_out), c2ri(sig[hop * K : hop * K + ov]),
                               rtol=1e-6)


def test_pipelined_dispatch_matches_sequential(bench_conf):
    """Depth-2 pipelined streaming (dispatch k+1 before collecting k)
    must produce exactly the synchronous per-block bit stream, one
    block later."""
    protocol = loadProtocol("bench_FSK")(conf=bench_conf)
    dA = UHF.Demodulator(bench_conf, protocol, "UHF-H")
    dB = UHF.Demodulator(bench_conf, protocol, "UHF-H")

    N, ov = dA.Nfft, dA.sigOverlap
    hop = N - ov
    K = 6
    rng = np.random.RandomState(7)
    nbits = (ov + hop * K) // 16 + 8
    bits = rng.randint(0, 2, nbits)
    sig = make_fsk_signal(bits, 16, 38400 / dA.spec.sampleRate, seed=8, noise_std=0.05)
    sig = np.r_[sig, np.zeros(hop * K, np.complex64)][: hop * K]
    hops = sig.reshape(K, hop)

    # A: synchronous per-block streaming
    rawA = dA.get_signalBufferHostPointer()
    seqA = []
    for i in range(K):
        rawA[ov:] = hops[i]
        seqA.append(dA.process(rawA))
        rawA[:ov] = rawA[-ov:]

    # B: depth-2 pipeline — one handle always in flight; the staging
    # buffer advances BEFORE the previous block is collected (the
    # dispatch must have snapshotted its input)
    rawB = dB.get_signalBufferHostPointer()
    seqB = []
    inflight = []
    for i in range(K):
        rawB[ov:] = hops[i]
        inflight.append(dB.dispatch(rawB))
        rawB[:ov] = rawB[-ov:]
        if len(inflight) >= 2:
            seqB.append(dB.collect(inflight.pop(0)))
    while inflight:
        seqB.append(dB.collect(inflight.pop(0)))

    assert len(seqA) == len(seqB) == K
    for i, (a, b) in enumerate(zip(seqA, seqB)):
        np.testing.assert_array_equal(a["bits"], b["bits"],
                                      err_msg=f"bits differ at block {i}")
        np.testing.assert_array_equal(a["trust"], b["trust"],
                                      err_msg=f"trust differs at block {i}")
        assert a["doppler"] == b["doppler"]
        assert a["SNR"] == b["SNR"]
