"""XML-RPC management/monitoring server.

Capability parity with the reference ``RpcInterface``
(``pyCuSDR/rpcInterface.py``): a daemon thread serving ~40 get/set
methods over SimpleXMLRPCServer — Tx/Rx rangerate, frequencies, IF
offsets, SNR, baud rates, gains and sample rates (the radio-hardware
ones proxied to GNU Radio's own XML-RPC server), GRC service
start/kill forwarding, and the softCombiner active-worker query.
Higher-level ops software (pass schedulers, gpredict glue) drives the
modem through this surface.
"""

import logging
import socket
import threading
from xmlrpc.server import Fault, SimpleXMLRPCRequestHandler, SimpleXMLRPCServer

from pycusdr_tpu.globals import LOG_NAME

log = logging.getLogger(LOG_NAME + "." + __name__)

FC_TOL = 1e5
FS_TOL = 1e4


class RequestHandler(SimpleXMLRPCRequestHandler):
    rpc_paths = ("/RPC2",)


class RpcInterface(threading.Thread):
    GRCRunning = False

    def __init__(self, conf, modulator=None, demodulator=None, softCombiner=None):
        threading.Thread.__init__(self)
        self.daemon = True
        self.conf = conf

        # normalize modulators to a name->process dict; fall back to a
        # dummy for unit tests (reference rpcInterface.py:33-52)
        if not modulator:
            self.modulator = {"UHF": dummyModulator()}
        elif isinstance(modulator, dict):
            self.modulator = modulator
        elif isinstance(modulator, list):
            self.modulator = {m.name: m for m in modulator}
        else:
            self.modulator = {"UHF": modulator}

        if demodulator is None:
            self.demodulator = [dummyModulator()]
        elif isinstance(demodulator, list):
            self.demodulator = demodulator
        else:
            self.demodulator = [demodulator]

        self.softCombiner = softCombiner
        self._stopEvent = threading.Event()

        # optional GNU Radio service-control + flowgraph RPC clients
        self.GRCServiceControl = None
        self.GRCRpc = None
        import xmlrpc.client

        try:
            addr = conf["Interfaces"]["External"]["GRCServiceControl"]
            log.info("Registering GRC servicecontrol on %s", addr)
            self.GRCServiceControl = xmlrpc.client.Server(addr)
        except Exception as e:
            log.warning("No GRC service control: %s", e)

        socket.setdefaulttimeout(1)
        try:
            addr = conf["Interfaces"]["Internal"]["GRCRpc"]
            log.info("Registering GRC RPC interface on %s", addr)
            self.GRCRpc = xmlrpc.client.Server(addr)
        except Exception as e:
            log.warning("No GRC flowgraph RPC: %s", e)

        rpcAddr = conf["Interfaces"]["External"]["XMLRpcIn"]
        log.info("Registering XMLRPC server on %s", rpcAddr)
        addr, port = rpcAddr.rsplit(":", 1)
        self.rpcServ = server = SimpleXMLRPCServer(
            (addr, int(port)), requestHandler=RequestHandler,
            allow_none=True, logRequests=False,
        )
        server.register_introspection_functions()

        server.register_function(self.kill_GRC, "kill")
        server.register_function(self.start_GRC, "start")
        self._registerTxMethods(server)
        self._registerRxMethods(server)
        self._registerSoftCombinerMethods(server)

        self.start()

    # ---------------- Tx surface ----------------

    def _registerTxMethods(self, server):
        @server.register_function
        def get_config():
            """Returns the config"""
            return self.conf

        @server.register_function
        def get_Tx_rangerate(name="UHF"):
            return self.modulator[name].rangerate

        @server.register_function
        def set_Tx_rangerate(rangerate):
            """Sets the Tx rangerate for all modulators (and informs the
            demodulators, which use it for IF offset estimation)."""
            for modul in self.modulator.values():
                modul.rangerate = rangerate
            for demod in self.demodulator:
                demod.TxRangeRate = rangerate

        @server.register_function
        def get_Tx_samp_rate():
            return self._get_GRC("get_tx_samp_rate")

        @server.register_function
        def set_Tx_samp_rate(Fs):
            self._set_GRC("set_tx_samp_rate", Fs)

        @server.register_function
        def get_Tx_freq():
            try:
                return self._get_GRC("get_Tx_Freq")
            except Exception:
                log.warning("Could not read GRC Tx frequency")
                for name, m in self.modulator.items():
                    if "UHF" in name:
                        return m.Fc
                return 0

        @server.register_function
        def set_Tx_freq(Fc):
            raise NotImplementedError("Setting TxFc is not implemented")

        @server.register_function
        def get_Tx_freq_offset(name="UHF"):
            return self.modulator[name].centreFreqOffset

        @server.register_function
        def set_Tx_freq_offset(val, name="UHF"):
            self.modulator[name].centreFreqOffset = int(val)

        @server.register_function
        def get_Tx_GRC_freq_offset(name="UHF"):
            return self.modulator[name].freqOffset

        @server.register_function
        def get_Tx_total_freq_offset(name="UHF"):
            return self.modulator[name].totalFreqOffset

        @server.register_function
        def get_Tx_gain():
            return self._get_GRC("get_Tx_Gain")

        @server.register_function
        def set_Tx_gain(gain):
            self._set_GRC("set_Tx_Gain", gain)

        @server.register_function
        def get_Tx_baud_rate(name="UHF"):
            return self.modulator[name].baudRate

    # ---------------- Rx surface ----------------

    def _registerRxMethods(self, server):
        @server.register_function
        def get_Rx_rangerate(antenna=0):
            return self.demodulator[antenna].rangerate

        @server.register_function
        def set_Rx_rangerate(rangerate, antenna=0):
            raise NotImplementedError("Setting the RxRangeRate is not implemented")

        @server.register_function
        def get_Rx_baud_rate(antenna=0):
            return self._get_GRC("get_baudRate")

        @server.register_function
        def get_Rx_baud_rate_est(antenna=0):
            return self.demodulator[antenna].baudRateEst

        @server.register_function
        def get_Rx_samp_rate(antenna=0):
            return self._get_GRC("get_sample_rate")

        @server.register_function
        def set_Rx_samp_rate(Fs, antenna=0):
            try:
                self.GRCRpc.set_sample_rate(Fs)
            except Fault as e:
                Fs_read = self.GRCRpc.get_sample_rate()
                if abs(Fs - Fs_read) > FS_TOL:
                    raise Exception(
                        f"sample rate off: reading {Fs_read} Hz, desired {Fs} Hz"
                    ) from e

        @server.register_function
        def get_Rx_freq(antenna=0):
            try:
                return self._get_GRC("get_Rx_freq")
            except Exception:
                log.warning("Could not read GRC Rx frequency")
                return self.demodulator[antenna].Fc

        @server.register_function
        def set_Rx_freq(Fc, antenna=0):
            log.info("Setting Rx centre frequency to %s Hz", Fc)
            try:
                self.GRCRpc.set_Rx_Fc(Fc)
            except Fault as e:
                freq = self._get_GRC("get_Rx_freq")
                if abs(freq - Fc) > FC_TOL:
                    raise Exception(
                        f"failed to set Rx frequency to {Fc} Hz (read {freq} Hz)"
                    ) from e

        @server.register_function
        def get_Rx_GRC_freq_offset(antenna=0):
            return self._get_GRC("get_Rx_Freq_Offset")

        @server.register_function
        def get_Rx_freq_offset(antenna=0):
            return self.demodulator[antenna].RxFreqOffset

        @server.register_function
        def get_Rx_IF_freq_offset_est(antenna=0):
            return self.demodulator[antenna].RxIFFreqOffset

        @server.register_function
        def get_Tx_IF_freq_offset_est(antenna=0):
            return self.demodulator[antenna].TxIFFreqOffset

        @server.register_function
        def get_Rx_SNR(antenna=0):
            return self.demodulator[antenna].SNR

        @server.register_function
        def get_Rx_gain():
            return self._get_GRC("get_RxGain")

        @server.register_function
        def set_Rx_gain(val):
            self.GRCRpc.set_RxGain(val)

        @server.register_function
        def get_Rx_antenna_name(antenna=0):
            return self.demodulator[antenna].workerId

    def _registerSoftCombinerMethods(self, server):
        @server.register_function
        def get_active_workers(timeout=0.25):
            """Names of diversity channels that submitted data recently."""
            if self.softCombiner is None:
                return []
            return self.softCombiner.getActiveWorkers(timeout)

    # ---------------- lifecycle ----------------

    def terminate(self):
        self._stopEvent.set()
        try:
            self.rpcServ.server_close()
        except Exception:
            pass

    def run(self):
        self.rpcServ.timeout = 0.5
        while not self._stopEvent.is_set():
            self.rpcServ.handle_request()
        log.info("XMLRPC server terminated")

    # ---------------- GRC helpers ----------------

    def _get_GRC(self, cmd):
        try:
            return getattr(self.GRCRpc, cmd)()
        except Exception:
            msg = f"Could not execute GRC command '{cmd}' -- is GRC running?"
            log.warning("RPC call error: %s", msg)
            raise Exception(msg)

    def _set_GRC(self, cmd, val):
        try:
            getattr(self.GRCRpc, cmd)(val)
        except Exception:
            msg = f"Could not execute GRC command '{cmd}' -- is GRC running?"
            log.warning("RPC call error: %s", msg)
            raise Exception(msg)

    def start_GRC(self):
        """Forward start() to the GRC service control."""
        log.info("Starting GRC")
        self.GRCServiceControl.start()
        self.GRCRunning = True
        return 1

    def kill_GRC(self):
        """Forward kill() to the GRC service control."""
        log.info("Stopping GRC")
        self.GRCRunning = False
        try:
            socket.setdefaulttimeout(5)
            self.GRCServiceControl.kill()
            socket.setdefaulttimeout(1)
        except socket.timeout:
            raise TimeoutError("Timeout while attempting to kill GRC")
        return 1


class dummyModulator:
    """Implements the modulator/demodulator value surface for unit tests
    (reference rpcInterface.py:505-529)."""

    def __init__(self):
        self._Fs = 256
        self._rangerate = 10.2
        self._Fc = 10000
        self.TxRangeRate = 0.0
        self.RxFreqOffset = 0.0
        self.RxIFFreqOffset = 0.0
        self.TxIFFreqOffset = 0.0
        self.SNR = 0.0
        self.baudRateEst = 0.0
        self.workerId = "dummy"
        self.centreFreqOffset = 0
        self.freqOffset = 0
        self.totalFreqOffset = 0
        self.baudRate = 9600

    @property
    def Fs(self):
        return self._Fs

    @property
    def Fc(self):
        return self._Fc

    @property
    def rangerate(self):
        return self._rangerate

    @rangerate.setter
    def rangerate(self, rangerate):
        log.warning("Dummy method received rangerate %f", rangerate)
        self._rangerate = rangerate
