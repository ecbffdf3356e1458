"""Full hardware-free loopback through the process pipeline: payload
bytes -> Modulator_process (frame + LUT modulate) -> simulated channel
-> Demodulator_process -> Decoder -> decoded bytes. The in-software
equivalent of the reference's examples/loopback_uhd_example."""

import os
import time

import numpy as np
import pytest
import zmq

from pycusdr_tpu.config.loader import load_modular_json

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu", "config", "configs")


@pytest.mark.parametrize("pipelineDepth", [1, 2])
def test_tx_rx_loopback_through_processes(pipelineDepth):
    os.environ["PYCUSDR_JAX_PLATFORM"] = "cpu"
    from pycusdr_tpu.dsp.signal_gen import awgn
    from pycusdr_tpu.protocol.benchmark.bench_base import MASKLEN, seeded_bits
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    conf = load_modular_json(os.path.join(CONF_DIR, "benchmark", "bench_FSK.json"))
    conf["Main"].update(workerId="loop", PacketLen=1000)
    conf["GPU"]["UHF"].update(blockSize=13, overlap=10)
    # depth 2 exercises the async in-flight dispatch path end-to-end
    conf["GPU"]["UHF"].setdefault("TPU", {})["pipelineDepth"] = pipelineDepth
    conf["Radios"]["Rx"]["UHF-H"]["doppCarrierSteps"] = 16
    conf["Radios"]["Rx"]["UHF-H"]["Interfaces"] = {
        "RxInPort": "tcp://127.0.0.1:29560",
        "demodOut": "tcp://localhost:29003",
    }
    conf["Radios"]["Tx"] = {
        "UHF": {
            "baud": 9600, "samplesPerSym": 16,
            "frequency_Hz": 437.3e6, "frequencyOffset_Hz": 38400,
            "Protocol": "UHF",
            "Interfaces": {
                "TxModToUSRPPort": "tcp://127.0.0.1:29571",
                "TxDataIn": "tcp://127.0.0.1:29501",
            },
        }
    }
    conf["Demodulator"] = {"timeoutSeconds": 60}
    conf["Interfaces"]["Internal"].update({
        "demodIn": "tcp://*:29003", "demodOut": "tcp://localhost:29003",
        "decodeOut": "tcp://localhost:29004", "decodeIn": "tcp://*:29004",
    })
    conf["Interfaces"]["External"]["decodeBytesOut_ZMQ"] = {"UHF": "tcp://*:29512"}
    conf["Interfaces"]["External"]["XMLRpcIn"] = "127.0.0.1:29851"
    conf["decoder"] = dict(conf.get("decoder", {}), statsPort=29901)

    ctx = zmq.Context()
    tx_in = ctx.socket(zmq.PUSH)
    tx_in.connect("tcp://127.0.0.1:29501")
    wave_out = ctx.socket(zmq.PULL)
    wave_out.connect("tcp://127.0.0.1:29571")
    wave_out.setsockopt(zmq.RCVTIMEO, 5000)
    rx_in = ctx.socket(zmq.PUB)
    rx_in.bind("tcp://127.0.0.1:29560")
    sink = ctx.socket(zmq.PULL)
    sink.connect("tcp://localhost:29512")
    sink.setsockopt(zmq.RCVTIMEO, 1500)

    sdr = PyCuSDR(dict(conf), args=None)
    sdr.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not all(t.is_alive() for t in sdr.tasks):
            time.sleep(0.2)
        time.sleep(4.0)

        # the bench packet's first MASKLEN bits ARE the Rx header mask,
        # so the Tx payload is the remainder of the seeded sequence
        packet_bits = seeded_bits(1000, 123).astype(np.uint8)
        payload_bits = packet_bits[MASKLEN:]

        rng = np.random.RandomState(0)
        step = 2**13 - 2**10
        decoded = None
        for attempt in range(10):
            tx_in.send(payload_bits.tobytes())
            try:
                wave = np.frombuffer(wave_out.recv(), np.complex64)
            except zmq.error.Again:
                continue
            assert len(wave) >= 16384  # noise-padded for front-end warm-up

            # simulated channel: mild AWGN, stream in GNU-Radio-size chunks
            chan = awgn(wave, 25.0, rng=rng).astype(np.complex64)
            chan = np.r_[chan, np.zeros(4 * step, np.complex64)]
            for pos in range(0, len(chan), step // 2):
                rx_in.send(chan[pos : pos + step // 2].tobytes())
                time.sleep(0.01)
            try:
                decoded = sink.recv()
                break
            except zmq.error.Again:
                continue

        assert decoded is not None, "loopback produced no decoded packet"
        protocol = sdr.protocols["UHF"]
        expected = bytes(bytearray(protocol.Packet(packet_bits).getBinaryData()[0]))
        assert decoded == expected, "loopback payload mismatch"
    finally:
        try:
            sdr.terminate()
        except Exception:
            pass
        for s in (tx_in, wave_out, rx_in, sink):
            s.close()
        ctx.term()
