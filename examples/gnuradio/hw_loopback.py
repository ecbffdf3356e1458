#!/usr/bin/env python3
"""Hardware loopback front-end: USRP (UHD) or BladeRF (Soapy/osmosdr).

Runnable counterpart of the reference's hardware flowgraphs
(``examples/loopback_uhd_example/uhd_graph.py:1-307`` drives a USRP
B210, ``blade_graph.py:1-299`` a BladeRF), redesigned as ONE headless
parameterized flowgraph instead of two GRC-generated Qt programs:

* **Rx**: SDR source (tuned ``Fc - if_offset`` so the signal sits at
  the modem's IF, never at DC) -> ZMQ PUB of raw complex64 IQ on
  ``--rx-pub`` (the modem's ``Radios.Rx.<radio>.Interfaces.RxInPort``).
* **Tx**: ZMQ PULL of complete burst waveforms on ``--tx-pull`` (the
  modem's ``TxModToUSRPPort``; IF offset + Doppler pre-compensation are
  already mixed in by the modulator) -> SDR sink.
* **Control**: instead of Qt sliders, an XML-RPC server (``--rpc``)
  exposes the exact method names the modem's control plane proxies
  (``pycusdr_tpu/control/rpc.py`` ``_get_GRC``/``_set_GRC``, mirroring
  reference ``rpcInterface.py:453-480``): gains, frequencies, sample
  rate, and a ``set_doppler_Hz`` to detune the Tx like the reference's
  "Frequency offset" slider — so the loopback Doppler sweep can be
  scripted (or driven from gpredict through the modem's rig server)
  rather than dragged by hand.

Run (USRP B210):
    python hw_loopback.py --backend uhd
Run (BladeRF):
    python hw_loopback.py --backend soapy --device driver=bladerf
Then start the modem with the shipped CC11xx config (ports match):
    python -m pycusdr_tpu -c pycusdr_tpu/config/configs/CC11xx.json -v
And inject/receive packets:
    python examples/zmq_listeners/send_packet.py / recv_packets.py

``--selftest`` exercises the control server end-to-end (XML-RPC client
against a mock radio) with no GNU Radio install — the part of this
front-end that is our code rather than GNU Radio plumbing.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading
import time
from dataclasses import dataclass, field
from xmlrpc.server import SimpleXMLRPCServer


@dataclass
class FrontendParams:
    baud: float = 7416.0
    spsym: int = 128
    fc_hz: float = 401.538e6
    if_offset_hz: float = None  # default: 20*baud, like the reference
    rx_gain: float = 0.0
    tx_gain: float = 0.0
    doppler_hz: float = 0.0  # Tx detune, simulates Doppler in loopback
    rx_pub: str = "tcp://127.0.0.1:5560"
    tx_pull: str = "tcp://127.0.0.1:5571"
    rpc_bind: tuple = ("0.0.0.0", 8080)
    device: str = ""  # UHD device args / Soapy driver string
    rx_antenna: str = "RX2"
    tx_antenna: str = "TX/RX"

    def __post_init__(self):
        if self.if_offset_hz is None:
            self.if_offset_hz = 20.0 * self.baud

    @property
    def samp_rate(self) -> float:
        return self.baud * self.spsym

    @property
    def rx_tune_hz(self) -> float:
        return self.fc_hz - self.if_offset_hz

    @property
    def tx_tune_hz(self) -> float:
        return self.fc_hz - self.if_offset_hz + self.doppler_hz


class FrontendControl:
    """XML-RPC control surface with the modem-proxied method names.

    ``radio`` is any object with set_rx_freq/set_tx_freq/set_rx_gain/
    set_tx_gain/set_samp_rate(value) methods (the flowgraph adapter, or
    a mock under --selftest).
    """

    def __init__(self, params: FrontendParams, radio):
        self.p = params
        self.radio = radio
        self._server = None

    # --- registered methods (names = what control/rpc.py proxies) ---
    def get_sample_rate(self):
        return float(self.p.samp_rate)

    def set_sample_rate(self, fs):
        self.p.spsym = int(round(float(fs) / self.p.baud))
        self.radio.set_samp_rate(self.p.samp_rate)
        return True

    def get_tx_samp_rate(self):
        return float(self.p.samp_rate)

    def set_tx_samp_rate(self, fs):
        return self.set_sample_rate(fs)

    def get_baudRate(self):
        return float(self.p.baud)

    def set_baud_rate(self, baud):
        self.p.baud = float(baud)
        self.radio.set_samp_rate(self.p.samp_rate)
        return True

    def get_Rx_freq(self):
        return float(self.p.fc_hz)

    def set_Rx_Fc(self, fc):
        self.p.fc_hz = float(fc)
        self.radio.set_rx_freq(self.p.rx_tune_hz)
        self.radio.set_tx_freq(self.p.tx_tune_hz)
        return True

    def get_Rx_Freq_Offset(self):
        return float(self.p.if_offset_hz)

    def get_RxGain(self):
        return float(self.p.rx_gain)

    def set_RxGain(self, g):
        self.p.rx_gain = float(g)
        self.radio.set_rx_gain(self.p.rx_gain)
        return True

    def get_Tx_Freq(self):
        return float(self.p.fc_hz)

    def get_Tx_Gain(self):
        return float(self.p.tx_gain)

    def set_Tx_Gain(self, g):
        self.p.tx_gain = float(g)
        self.radio.set_tx_gain(self.p.tx_gain)
        return True

    def get_doppler_Hz(self):
        return float(self.p.doppler_hz)

    def set_doppler_Hz(self, hz):
        """Detune the Tx by ``hz`` (loopback Doppler simulation; the
        reference exposed this as the 'Frequency offset' Qt slider)."""
        self.p.doppler_hz = float(hz)
        self.radio.set_tx_freq(self.p.tx_tune_hz)
        return True

    # --- server lifecycle ---
    def serve(self, background=True):
        srv = SimpleXMLRPCServer(self.p.rpc_bind, allow_none=True,
                                 logRequests=False)
        for name in ("get_sample_rate", "set_sample_rate",
                     "get_tx_samp_rate", "set_tx_samp_rate",
                     "get_baudRate", "set_baud_rate",
                     "get_Rx_freq", "set_Rx_Fc", "get_Rx_Freq_Offset",
                     "get_RxGain", "set_RxGain",
                     "get_Tx_Freq", "get_Tx_Gain", "set_Tx_Gain",
                     "get_doppler_Hz", "set_doppler_Hz"):
            srv.register_function(getattr(self, name), name)
        self._server = srv
        if background:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            return t
        srv.serve_forever()

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()


def build_top_block(p: FrontendParams, backend: str):
    """Assemble the GNU Radio graph. Imports gnuradio lazily so the
    control layer stays testable on machines without it."""
    from gnuradio import gr, zeromq

    class _Graph(gr.top_block):
        def __init__(self):
            gr.top_block.__init__(self, "pycusdr_tpu hw loopback")
            self.zmq_pub = zeromq.pub_sink(gr.sizeof_gr_complex, 1,
                                           p.rx_pub, 100, False, -1)
            self.zmq_pull = zeromq.pull_source(gr.sizeof_gr_complex, 1,
                                               p.tx_pull, 100, False, -1)
            if backend == "uhd":
                from gnuradio import uhd

                self.src = uhd.usrp_source(
                    p.device, uhd.stream_args(cpu_format="fc32",
                                              channels=[0]))
                self.snk = uhd.usrp_sink(
                    p.device, uhd.stream_args(cpu_format="fc32",
                                              channels=[0]), "")
                self.src.set_antenna(p.rx_antenna, 0)
                self.snk.set_antenna(p.tx_antenna, 0)
                self._set = dict(
                    rx_freq=lambda f: self.src.set_center_freq(f, 0),
                    tx_freq=lambda f: self.snk.set_center_freq(f, 0),
                    rx_gain=lambda g: self.src.set_gain(g, 0),
                    tx_gain=lambda g: self.snk.set_gain(g, 0),
                    samp_rate=self._both_rates,
                )
            else:  # soapy covers BladeRF (driver=bladerf), LimeSDR, ...
                try:
                    from gnuradio import soapy

                    dev = p.device or "driver=bladerf"
                    self.src = soapy.source(dev, "fc32", 1, "", "", [""], [""])
                    self.snk = soapy.sink(dev, "fc32", 1, "", "", [""], [""])
                    self._set = dict(
                        rx_freq=lambda f: self.src.set_frequency(0, f),
                        tx_freq=lambda f: self.snk.set_frequency(0, f),
                        rx_gain=lambda g: self.src.set_gain(0, g),
                        tx_gain=lambda g: self.snk.set_gain(0, g),
                        samp_rate=self._both_rates,
                    )
                except ImportError:  # older installs: gr-osmosdr
                    import osmosdr

                    dev = p.device or "bladerf=0"
                    self.src = osmosdr.source(args=dev)
                    self.snk = osmosdr.sink(args=dev)
                    self._set = dict(
                        rx_freq=lambda f: self.src.set_center_freq(f, 0),
                        tx_freq=lambda f: self.snk.set_center_freq(f, 0),
                        rx_gain=lambda g: self.src.set_gain(g, 0),
                        tx_gain=lambda g: self.snk.set_gain(g, 0),
                        samp_rate=self._both_rates,
                    )
            self.set_samp_rate(p.samp_rate)
            self.set_rx_freq(p.rx_tune_hz)
            self.set_tx_freq(p.tx_tune_hz)
            self.set_rx_gain(p.rx_gain)
            self.set_tx_gain(p.tx_gain)
            self.connect(self.src, self.zmq_pub)
            self.connect(self.zmq_pull, self.snk)

        def _both_rates(self, fs):
            for dev in (self.src, self.snk):
                if hasattr(dev, "set_samp_rate"):
                    dev.set_samp_rate(fs)
                else:  # soapy
                    dev.set_sample_rate(0, fs)

        # adapter surface consumed by FrontendControl
        def set_rx_freq(self, f):
            self._set["rx_freq"](f)

        def set_tx_freq(self, f):
            self._set["tx_freq"](f)

        def set_rx_gain(self, g):
            self._set["rx_gain"](g)

        def set_tx_gain(self, g):
            self._set["tx_gain"](g)

        def set_samp_rate(self, fs):
            self._set["samp_rate"](fs)

    return _Graph()


@dataclass
class _MockRadio:
    calls: list = field(default_factory=list)

    def __getattr__(self, name):
        if name.startswith("set_"):
            return lambda v: self.calls.append((name, float(v)))
        raise AttributeError(name)


def selftest(port=28099):
    """Drive the control server through a real XML-RPC round trip."""
    import xmlrpc.client

    p = FrontendParams(rpc_bind=("127.0.0.1", port))
    radio = _MockRadio()
    ctl = FrontendControl(p, radio)
    ctl.serve(background=True)
    try:
        cli = xmlrpc.client.ServerProxy(f"http://127.0.0.1:{port}")
        assert cli.get_sample_rate() == 7416.0 * 128
        assert cli.get_Rx_Freq_Offset() == 20.0 * 7416.0
        cli.set_RxGain(23.5)
        cli.set_Tx_Gain(11.0)
        cli.set_doppler_Hz(-4000.0)
        cli.set_Rx_Fc(437.3e6)
        assert cli.get_RxGain() == 23.5
        assert cli.get_doppler_Hz() == -4000.0
        assert cli.get_Rx_freq() == 437.3e6
        # Doppler detunes only the Tx; Rx stays at Fc - IF
        tx_freqs = [v for k, v in radio.calls if k == "set_tx_freq"]
        rx_freqs = [v for k, v in radio.calls if k == "set_rx_freq"]
        assert tx_freqs[-1] == 437.3e6 - 20 * 7416.0 - 4000.0
        assert rx_freqs[-1] == 437.3e6 - 20 * 7416.0
        print("selftest OK:", len(radio.calls), "radio calls")
    finally:
        ctl.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--backend", choices=["uhd", "soapy"], default="uhd")
    ap.add_argument("--device", default="",
                    help='UHD args or Soapy driver string, e.g. "driver=bladerf"')
    ap.add_argument("--baud", type=float, default=7416.0)
    ap.add_argument("--spsym", type=int, default=128)
    ap.add_argument("--fc", type=float, default=401.538e6)
    ap.add_argument("--if-offset", type=float, default=None)
    ap.add_argument("--rx-gain", type=float, default=0.0)
    ap.add_argument("--tx-gain", type=float, default=0.0)
    ap.add_argument("--doppler", type=float, default=0.0)
    ap.add_argument("--rx-pub", default="tcp://127.0.0.1:5560")
    ap.add_argument("--tx-pull", default="tcp://127.0.0.1:5571")
    ap.add_argument("--rpc-port", type=int, default=8080)
    ap.add_argument("--rx-antenna", default="RX2")
    ap.add_argument("--tx-antenna", default="TX/RX")
    ap.add_argument("--selftest", action="store_true",
                    help="exercise the control server with a mock radio "
                         "(no GNU Radio needed) and exit")
    args = ap.parse_args(argv)

    if args.selftest:
        selftest()
        return 0

    p = FrontendParams(
        baud=args.baud, spsym=args.spsym, fc_hz=args.fc,
        if_offset_hz=args.if_offset, rx_gain=args.rx_gain,
        tx_gain=args.tx_gain, doppler_hz=args.doppler,
        rx_pub=args.rx_pub, tx_pull=args.tx_pull,
        rpc_bind=("0.0.0.0", args.rpc_port), device=args.device,
        rx_antenna=args.rx_antenna, tx_antenna=args.tx_antenna,
    )
    try:
        tb = build_top_block(p, args.backend)
    except ImportError as e:
        print(f"GNU Radio (or the {args.backend} blocks) not installed: {e}\n"
              "Install gnuradio + UHD/SoapySDR drivers, or use "
              "examples/gnuradio/sim_frontend.py for a software-only run.",
              file=sys.stderr)
        return 2

    ctl = FrontendControl(p, tb)
    ctl.serve(background=True)
    print(f"RPC control on :{args.rpc_port}; Rx PUB {p.rx_pub} "
          f"@{p.samp_rate:.0f} sps (tuned {p.rx_tune_hz/1e6:.4f} MHz); "
          f"Tx PULL {p.tx_pull}")

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    tb.start()
    try:
        while not stop.is_set():
            time.sleep(0.2)
    finally:
        tb.stop()
        tb.wait()
        ctl.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
