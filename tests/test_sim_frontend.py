"""End-to-end smoke test of the GNU Radio front-end stand-in:
sim_frontend synthesizes a noise floor + seeded bench packets (with a
Doppler offset ramp) and PUBs them at the documented wire format; the
full modem (spawned demod + decoder over ZMQ) must decode them.

Mirrors the role of the reference's loopback flowgraphs
(``examples/loopback_uhd_example/uhd_graph.py``) without GNU Radio.
"""

import json
import os
import sys
import threading
import time

import numpy as np
import pytest
import zmq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples", "gnuradio"))

from pycusdr_tpu.config.loader import load_modular_json

CONF = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu",
                    "config", "configs", "benchmark", "bench_FSK.json")
BASE = 29300


@pytest.fixture
def sim_conf(tmp_path):
    conf = load_modular_json(CONF)
    conf["Main"]["PacketLen"] = 4000
    rx = conf["Radios"]["Rx"]
    name = list(rx)[0]
    conf["Radios"]["Rx"] = {name: rx[name]}
    rx[name]["Interfaces"] = {
        "RxInPort": f"tcp://127.0.0.1:{BASE}",
        "demodOut": f"tcp://localhost:{BASE + 100}",
    }
    conf["Interfaces"]["Internal"].update({
        "demodIn": f"tcp://*:{BASE + 100}",
        "demodOut": f"tcp://localhost:{BASE + 100}",
        "decodeOut": f"tcp://localhost:{BASE + 101}",
        "decodeIn": f"tcp://*:{BASE + 101}",
    })
    conf["Interfaces"]["External"]["decodeBytesOut_ZMQ"] = {"UHF": f"tcp://*:{BASE + 102}"}
    conf["Interfaces"]["External"]["XMLRpcIn"] = f"127.0.0.1:{BASE + 103}"
    conf["decoder"] = dict(conf.get("decoder", {}), statsPort=BASE + 104)
    p = tmp_path / "sim_conf.json"
    p.write_text(json.dumps(conf))
    return conf, str(p)


def test_sim_frontend_feeds_the_modem(sim_conf):
    conf, conf_path = sim_conf
    from pycusdr_tpu.runtime.orchestrator import PyCuSDR

    import sim_frontend

    sdr = PyCuSDR(dict(conf), args=None)
    sdr.start()
    ctx = zmq.Context()
    sink = ctx.socket(zmq.PULL)
    sink.connect(f"tcp://localhost:{BASE + 102}")
    sink.setsockopt(zmq.RCVTIMEO, 500)

    fe = threading.Thread(
        target=sim_frontend.main,
        args=([ "-c", conf_path, "--snr", "15", "--interval", "5",
                "--duration", "55", "--doppler-max", "300",
                "--pass-duration", "110" ],),
        daemon=True,
    )
    try:
        fe.start()
        got = []
        deadline = time.time() + 70
        while time.time() < deadline and not got:
            try:
                got.append(sink.recv())
            except zmq.error.Again:
                continue
        assert got, "modem decoded nothing from the simulated front-end"
        # bench packets: payload is the seeded bit sequence, one byte/bit
        from pycusdr_tpu.dsp.signal_gen import packet_data

        bits = np.frombuffer(got[0], np.uint8)
        truth = packet_data(conf["Main"]["PacketLen"], 123)
        n = min(len(bits), len(truth))
        assert n > 3000
        assert np.mean(bits[:n] == truth[:n]) > 0.999
    finally:
        fe.join(timeout=60)
        sdr.terminate()
        sink.close()
        ctx.term()
