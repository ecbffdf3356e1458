"""Multi-protocol operation: two Rx radios speaking different protocols
through one orchestrator, decoded bytes routed to per-protocol ZMQ
ports (reference pyCuSDR.py:285-300 multi-protocol support)."""

import os
import time

import numpy as np
import pytest
import zmq

from pycusdr_tpu.config.loader import load_modular_json

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu", "config", "configs")


def test_two_protocols_route_to_their_ports():
    os.environ["PYCUSDR_JAX_PLATFORM"] = "cpu"
    from pycusdr_tpu.dsp.signal_gen import get_padded_packet, packet_data
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    conf = load_modular_json(os.path.join(CONF_DIR, "benchmark", "bench_FSK.json"))
    conf["Main"].update(
        workerId="mp", PacketLen=1000,
        protocols={"UHF": "bench_FSK", "SBAND": "bench_GMSK"},
    )
    conf["GPU"]["UHF"].update(blockSize=13, overlap=10)
    base = conf["Radios"]["Rx"]["UHF-H"]
    conf["Radios"]["Rx"] = {
        "UHF-H": dict(base, doppCarrierSteps=16, Protocol="UHF",
                      Interfaces={"RxInPort": "tcp://127.0.0.1:33560",
                                  "demodOut": "tcp://localhost:33003"}),
        "SBAND-H": dict(base, name="SBAND", doppCarrierSteps=16, Protocol="SBAND",
                        Interfaces={"RxInPort": "tcp://127.0.0.1:33561",
                                    "demodOut": "tcp://localhost:33003"}),
    }
    conf["Demodulator"] = {"timeoutSeconds": 60}
    conf["Interfaces"]["Internal"].update({
        "demodIn": "tcp://*:33003", "demodOut": "tcp://localhost:33003",
        "decodeOut": "tcp://localhost:33004", "decodeIn": "tcp://*:33004",
    })
    conf["Interfaces"]["External"]["decodeBytesOut_ZMQ"] = {
        "UHF": "tcp://*:33512", "SBAND": "tcp://*:33513",
    }
    conf["Interfaces"]["External"]["XMLRpcIn"] = "127.0.0.1:33851"
    conf["decoder"] = dict(conf.get("decoder", {}), statsPort=33901)

    bits = packet_data(1000, 123)
    fs = 9600 * 16
    sig_fsk, _ = get_padded_packet("FSK", 16, fs, offset_freq=38400,
                                   raw_bits=bits, pad=6000)
    sig_gmsk, _ = get_padded_packet("GMSK", 16, fs, offset_freq=38400,
                                    raw_bits=bits, pad=6000)

    ctx = zmq.Context()
    pub_u = ctx.socket(zmq.PUB)
    pub_u.bind("tcp://127.0.0.1:33560")
    pub_s = ctx.socket(zmq.PUB)
    pub_s.bind("tcp://127.0.0.1:33561")
    sink_u = ctx.socket(zmq.PULL)
    sink_u.connect("tcp://localhost:33512")
    sink_u.setsockopt(zmq.RCVTIMEO, 1500)
    sink_s = ctx.socket(zmq.PULL)
    sink_s.connect("tcp://localhost:33513")
    sink_s.setsockopt(zmq.RCVTIMEO, 1500)

    sdr = PyCuSDR(dict(conf), args=None)
    sdr.start()
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not all(d.is_alive() for d in sdr.demodulators):
            time.sleep(0.2)
        time.sleep(6.0)

        step = 2**13 - 2**10
        stream_u = np.r_[sig_fsk.astype(np.complex64), np.zeros(6 * step, np.complex64)]
        stream_s = np.r_[sig_gmsk.astype(np.complex64), np.zeros(6 * step, np.complex64)]
        got_u = got_s = None
        for _ in range(15):
            for pos in range(0, max(len(stream_u), len(stream_s)) - step, step):
                pub_u.send(stream_u[pos : pos + step].tobytes())
                pub_s.send(stream_s[pos : pos + step].tobytes())
                time.sleep(0.02)
            if got_u is None:
                try:
                    got_u = sink_u.recv()
                except zmq.error.Again:
                    pass
            if got_s is None:
                try:
                    got_s = sink_s.recv()
                except zmq.error.Again:
                    pass
            if got_u is not None and got_s is not None:
                break

        assert got_u is not None, "no packet on the UHF (FSK) output port"
        assert got_s is not None, "no packet on the SBAND (GMSK) output port"
        exp_u = bytes(bytearray(sdr.protocols["UHF"].Packet(bits).getBinaryData()[0]))
        exp_s = bytes(bytearray(sdr.protocols["SBAND"].Packet(bits).getBinaryData()[0]))
        assert got_u == exp_u
        assert got_s == exp_s
    finally:
        try:
            sdr.terminate()
        except Exception:
            pass
        for s in (pub_u, pub_s, sink_u, sink_s):
            s.close()
        ctx.term()
