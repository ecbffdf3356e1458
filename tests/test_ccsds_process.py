"""Concatenated CCSDS (conv K=7 r=1/2 + RS) through the REAL process
pipeline: orchestrator-spawned modulator/demodulator/decoder linked by
ZMQ. Exercises the demod-trust -> decoder_process -> soft-decision
streaming Viterbi plumbing end-to-end (library-level loops cover the
algorithm; this covers the wiring)."""

import os
import time

import numpy as np
import pytest
import zmq

from pycusdr_tpu.config.loader import load_modular_json

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu", "config", "configs")


def test_concatenated_ccsds_through_processes():
    os.environ["PYCUSDR_JAX_PLATFORM"] = "cpu"
    from pycusdr_tpu.dsp.signal_gen import awgn
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    conf = load_modular_json(os.path.join(CONF_DIR, "benchmark", "bench_FSK.json"))
    conf["Main"].update(workerId="ccsds", protocols={"UHF": "ccsds_conv"})
    conf["GPU"]["UHF"].update(blockSize=13, overlap=10)
    conf["Radios"]["Rx"]["UHF-H"]["doppCarrierSteps"] = 16
    conf["Radios"]["Rx"]["UHF-H"]["Interfaces"] = {
        "RxInPort": "tcp://127.0.0.1:29660",
        "demodOut": "tcp://localhost:29603",
    }
    conf["Radios"]["Tx"] = {
        "UHF": {
            "baud": 9600, "samplesPerSym": 16,
            "frequency_Hz": 437.3e6, "frequencyOffset_Hz": 38400,
            "Protocol": "UHF",
            "Interfaces": {
                "TxModToUSRPPort": "tcp://127.0.0.1:29671",
                "TxDataIn": "tcp://127.0.0.1:29601",
            },
        }
    }
    conf["Demodulator"] = {"timeoutSeconds": 60}
    conf["Interfaces"]["Internal"].update({
        "demodIn": "tcp://*:29603", "demodOut": "tcp://localhost:29603",
        "decodeOut": "tcp://localhost:29604", "decodeIn": "tcp://*:29604",
    })
    conf["Interfaces"]["External"]["decodeBytesOut_ZMQ"] = {"UHF": "tcp://*:29612"}
    conf["Interfaces"]["External"]["XMLRpcIn"] = "127.0.0.1:29951"
    conf["decoder"] = dict(conf.get("decoder", {}), statsPort=29902)

    ctx = zmq.Context()
    tx_in = ctx.socket(zmq.PUSH)
    tx_in.connect("tcp://127.0.0.1:29601")
    wave_out = ctx.socket(zmq.PULL)
    wave_out.connect("tcp://127.0.0.1:29671")
    wave_out.setsockopt(zmq.RCVTIMEO, 5000)
    rx_in = ctx.socket(zmq.PUB)
    rx_in.bind("tcp://127.0.0.1:29660")
    sink = ctx.socket(zmq.PULL)
    sink.connect("tcp://localhost:29612")
    sink.setsockopt(zmq.RCVTIMEO, 1500)

    sdr = PyCuSDR(dict(conf), args=None)
    sdr.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not all(t.is_alive() for t in sdr.tasks):
            time.sleep(0.2)
        time.sleep(4.0)

        payload = np.frombuffer(b"PROCESS-LEVEL CONCATENATED FRAME " * 7, np.uint8)[:223]

        rng = np.random.RandomState(0)
        step = 2**13 - 2**10
        decoded = None
        for attempt in range(10):
            tx_in.send(payload.tobytes())
            try:
                wave = np.frombuffer(wave_out.recv(), np.complex64)
            except zmq.error.Again:
                continue

            chan = awgn(wave, 12.0, rng=rng).astype(np.complex64)
            chan = np.r_[chan, np.zeros(6 * step, np.complex64)]
            for pos in range(0, len(chan), step // 2):
                rx_in.send(chan[pos : pos + step // 2].tobytes())
                time.sleep(0.01)
            try:
                decoded = sink.recv()
                break
            except zmq.error.Again:
                continue

        assert decoded is not None, "no decoded CCSDS frame from the pipeline"
        got = np.frombuffer(decoded, np.uint8)
        np.testing.assert_array_equal(got[: len(payload)], payload)
        assert not np.any(got[len(payload):]), "virtual fill not zero"
    finally:
        try:
            sdr.terminate()
        except Exception:
            pass
        for s in (tx_in, wave_out, rx_in, sink):
            s.close()
        ctx.term()
