"""Lockstep channel-group runtime: two clock-shared channels, one
device dispatch per block, on-device vote — packets decode from both
the per-channel streams and the voted stream."""

import os
import time

import numpy as np
import pytest
import zmq

from pycusdr_tpu.config.loader import load_modular_json

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu", "config", "configs")


@pytest.mark.parametrize("pipelineDepth", [1, 2])
def test_channel_group_end_to_end(pipelineDepth):
    os.environ["PYCUSDR_JAX_PLATFORM"] = "cpu"
    from pycusdr_tpu.dsp.signal_gen import awgn, get_padded_packet, packet_data
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    conf = load_modular_json(os.path.join(CONF_DIR, "benchmark", "bench_FSK.json"))
    conf["Main"].update(workerId="cg", PacketLen=1000, channelGroup_enabled=True)
    conf["GPU"]["UHF"].update(blockSize=13, overlap=10)
    # depth 2 exercises the async in-flight group dispatch path
    conf["GPU"]["UHF"].setdefault("TPU", {})["pipelineDepth"] = pipelineDepth
    base = conf["Radios"]["Rx"]["UHF-H"]
    conf["Radios"]["Rx"] = {
        "UHF-H": dict(base, name="UHF0", doppCarrierSteps=16,
                      Interfaces={"RxInPort": "tcp://127.0.0.1:35560",
                                  "demodOut": "tcp://localhost:35003"}),
        "UHF-V": dict(base, name="UHF1", doppCarrierSteps=16,
                      Interfaces={"RxInPort": "tcp://127.0.0.1:35561",
                                  "demodOut": "tcp://localhost:35003"}),
    }
    conf["Demodulator"] = {"timeoutSeconds": 60}
    conf["Interfaces"]["Internal"].update({
        "demodIn": "tcp://*:35003", "demodOut": "tcp://localhost:35003",
        "decodeOut": "tcp://localhost:35004", "decodeIn": "tcp://*:35004",
    })
    conf["Interfaces"]["External"]["decodeBytesOut_ZMQ"] = {"UHF": "tcp://*:35512"}
    conf["Interfaces"]["External"]["XMLRpcIn"] = "127.0.0.1:35851"
    conf["decoder"] = dict(conf.get("decoder", {}), statsPort=35901)

    bits = packet_data(1000, 123)
    fs = 9600 * 16
    sig, _ = get_padded_packet("FSK", 16, fs, offset_freq=38400, raw_bits=bits, pad=6000)
    sig = sig.astype(np.complex64)

    ctx = zmq.Context()
    pubs = []
    for port in (35560, 35561):
        s = ctx.socket(zmq.PUB)
        s.bind(f"tcp://127.0.0.1:{port}")
        pubs.append(s)
    sink = ctx.socket(zmq.PULL)
    sink.connect("tcp://localhost:35512")
    sink.setsockopt(zmq.RCVTIMEO, 1500)

    sdr = PyCuSDR(dict(conf), args=None)
    assert len(sdr.demodulators) == 1, "channel group should be one process"
    sdr.start()
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not all(d.is_alive() for d in sdr.demodulators):
            time.sleep(0.2)
        time.sleep(6.0)

        rng = np.random.RandomState(5)
        step = 2**13 - 2**10
        stream = np.r_[sig, np.zeros(6 * step, np.complex64)]
        payload = None
        for _ in range(15):
            # independent noise per channel — the vote combines them
            chans = [awgn(stream, 14.0, rng=rng).astype(np.complex64) for _ in pubs]
            for pos in range(0, len(stream) - step, step):
                for s, c in zip(pubs, chans):
                    s.send(c[pos : pos + step].tobytes())
                time.sleep(0.02)
            try:
                payload = sink.recv()
                break
            except zmq.error.Again:
                continue

        assert payload is not None, "channel group produced no decoded packet"
        expected = bytes(bytearray(sdr.protocols["UHF"].Packet(bits).getBinaryData()[0]))
        assert payload == expected
    finally:
        try:
            sdr.terminate()
        except Exception:
            pass
        for s in pubs:
            s.close()
        sink.close()
        ctx.term()
