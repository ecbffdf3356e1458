"""Concurrent hamlib daemon: every radio entry served simultaneously.

Reference parity: ``start_pyCuSDR_hamlib_daemon.py:63-106`` listens on
every port in ``hamlib_sockets.json`` at once. Two clients connect to
two different radios at the same time; each gets its own modem boot and
an independent, interleaved hamlib session.
"""

import socket
import threading
import time

from pycusdr_tpu.control.dummy_radios import DummyRadio
from pycusdr_tpu.control.hamlib_daemon import serve_all

PORT_A = 24711
PORT_B = 24712


class _FakeModem:
    """Stands in for a booted PyCuSDR: just the rig-facing surface."""

    def __init__(self, cfg_path):
        self.cfg_path = cfg_path
        self.demodulators = [DummyRadio(437e6)]
        self.modulators = [DummyRadio(437e6)]
        self._alive = True

    def is_alive(self):
        return self._alive

    def terminate(self):
        self._alive = False


def _cmd(f, c):
    f.write(c + b"\n")
    f.flush()
    return f.readline().strip()


def test_two_radios_served_concurrently():
    sockets = {
        "UHF": {"addr": "127.0.0.1", "port": PORT_A, "config": "uhf.json"},
        "STX": {"addr": "127.0.0.1", "port": PORT_B, "config": "stx.json"},
    }
    booted = []
    boot_lock = threading.Lock()

    def modem_factory(cfg_path, args):
        m = _FakeModem(cfg_path)
        with boot_lock:
            booted.append(m)
        return m

    from pycusdr_tpu.control.rig_server import Rig_server

    def rig_factory(sock, client, sdr):
        rig = Rig_server(sock, client, sdr.demodulators, sdr.modulators)
        rig.start()
        return rig

    stop = threading.Event()
    ready = {}
    threads = serve_all(sockets, "/tmp", args=None,
                        modem_factory=modem_factory, rig_factory=rig_factory,
                        stop=stop, ready_events=ready)
    try:
        for ev in ready.values():
            assert ev.wait(5), "listener did not come up"

        sa = socket.create_connection(("127.0.0.1", PORT_A), timeout=5)
        sb = socket.create_connection(("127.0.0.1", PORT_B), timeout=5)
        fa = sa.makefile("rwb")
        fb = sb.makefile("rwb")

        # both sessions live at once, commands interleaved
        assert _cmd(fa, b"\\chk_vfo") == b"CHKVFO 0"
        assert _cmd(fb, b"\\chk_vfo") == b"CHKVFO 0"
        assert _cmd(fa, b"F 437010000") == b"RPRT 0"
        assert _cmd(fb, b"F 437020000") == b"RPRT 0"
        time.sleep(0.2)

        # one modem booted per connection, with the radio's own config
        deadline = time.time() + 5
        while len(booted) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(booted) == 2
        assert {m.cfg_path for m in booted} == {"/tmp/uhf.json", "/tmp/stx.json"}

        # steering is per-radio: each dummy saw only its own Doppler
        rates = sorted(m.demodulators[0].rangerate for m in booted)
        c = 299792458.0
        assert abs(rates[0] - 10000 / 437e6 * c) < 10
        assert abs(rates[1] - 20000 / 437e6 * c) < 10

        sa.close()
        sb.close()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=5)
