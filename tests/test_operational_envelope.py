"""Operational-envelope acceptance: the SHIPPED ground-station configs
driven end-to-end, not just the bench shapes.

* CC11xx at the operational envelope of the reference deployment
  (``config/CC11xx.json:33-50``): 7416 baud x 128 samples/symbol
  (~0.95 Msps), Nfft 2^16, 64 Doppler bins over rangeRateMax 27500 m/s
  — loaded from the shipped ``config/configs/CC11xx.json`` verbatim.
* STX at its 2^17-block profile (reference ``config/base.json:32-41``):
  no Doppler search, overlap 2^11, interference clipping ON — a full
  packet streamed and decoded, and a burst spike tagged trust -2.
"""

import os

import numpy as np
import pytest

from pycusdr_tpu.config.loader import load_modular_json
from pycusdr_tpu.decode import Decoder
from pycusdr_tpu.dsp.signal_gen import awgn
from pycusdr_tpu.models import STX, UHF
from pycusdr_tpu.protocol import loadProtocol
from pycusdr_tpu.tx.modulator import Modulator

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "pycusdr_tpu",
                        "config", "configs")


def _stream_and_decode(demod, decoder, sig):
    blockN, ov = demod.Nfft, demod.sigOverlap
    step = blockN - ov
    nblk = int(np.ceil(len(sig) / step)) + 2
    sig = np.r_[sig, np.zeros(nblk * step - len(sig) + step, np.complex64)]
    raw = demod.get_signalBufferHostPointer()

    found = []
    pos = 0
    while pos + step <= len(sig):
        raw[ov:] = sig[pos : pos + step]
        demod.uploadAndFindCarrier(raw)
        bits, _, trust, _ = demod.demodulate()
        pkts, _, _ = decoder.findFrames(bits, 0)
        found.extend(pkts)
        raw[:ov] = raw[-ov:]
        pos += step
    return found


def test_cc11xx_operational_envelope():
    """Shipped operational config, bit-exact CRC-clean packet at
    7416 baud x 128 sp/sym through the Nfft 2^16 streaming chain."""
    conf = load_modular_json(os.path.join(CONF_DIR, "CC11xx.json"))
    rx = conf["Radios"]["Rx"]["UHF-H"]
    assert rx["baud"] == 7416 and rx["samplesPerSym"] == 128
    assert conf["GPU"]["UHF"]["blockSize"] == 16

    protocol = loadProtocol("CC11xx")(conf=conf)
    mod = Modulator(conf, conf["Radios"]["Tx"]["UHF"], protocol)
    demod = UHF.Demodulator(conf, protocol, "UHF-H")
    decoder = Decoder(conf.get("decoder", {}), protocol)
    assert demod.Nfft == 2 ** 16
    assert demod.spec.doppler_search and demod.spec.D == 64

    payload = np.r_[np.array([17], np.uint8), np.arange(1, 48, dtype=np.uint8)]
    wave = mod.encodeAndModulate(payload)
    rng = np.random.RandomState(7)
    sig = awgn(wave.astype(np.complex64), 20.0, rng=rng).astype(np.complex64)

    found = _stream_and_decode(demod, decoder, sig)
    assert found, "no CC11xx packet found at the operational envelope"
    ok = any(
        not crcError and np.array_equal(np.asarray(data), payload)
        for data, crcError, _ in (p.getBinaryData() for p in found)
    )
    assert ok, "no bit-exact CRC-clean packet at 7416x128"


@pytest.fixture(scope="module")
def stx_op_conf(bench_conf):
    """STX at its real 2^17/2^11 block profile (reference
    config/base.json:32-41), bench_FSK air interface at a fixed IF."""
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in bench_conf.items()}
    base = load_modular_json(os.path.join(CONF_DIR, "base.json"))
    conf["GPU"] = dict(conf["GPU"], STX=dict(base["GPU"]["STX"]))
    assert conf["GPU"]["STX"]["blockSize"] == 17
    assert conf["GPU"]["STX"]["overlap"] == 11
    conf["Main"] = dict(conf["Main"], PacketLen=1000,
                        protocols={"STX": "bench_FSK"})
    conf["Radios"] = {
        "rangeRateMax": 7500,
        "Rx": {
            "STX": {
                "name": "STX", "CUDA_settings": "STX",
                "frequency_Hz": 2.4e9, "frequencyOffset_Hz": 38400,
                "baud": 9600, "samplesPerSym": 16, "doppCarrierSteps": 1,
                "Protocol": "STX", "radioBackend": "STX", "voteGroup": "STX",
                "Interfaces": {"RxInPort": "tcp://127.0.0.1:25590",
                               "demodOut": "tcp://localhost:20003"},
            }
        },
    }
    return conf


def test_stx_2e17_packet_stream(stx_op_conf):
    """A full packet through the 2^17-sample STX streaming chain
    decodes bit-exact (spike clipping armed but untriggered)."""
    from pycusdr_tpu.dsp.signal_gen import get_padded_packet, packet_data

    protocol = loadProtocol("bench_FSK")(conf=stx_op_conf)
    demod = STX.Demodulator(stx_op_conf, protocol, "STX")
    decoder = Decoder(stx_op_conf, protocol)
    assert demod.Nfft == 2 ** 17
    assert not demod.spec.doppler_search
    assert not demod.spec.disable_peak_thresholding

    bits = packet_data(1000, 123)
    fs = 9600 * 16
    sig, _ = get_padded_packet("FSK", 16, fs, offset_freq=38400,
                               raw_bits=bits, pad=8000)
    rng = np.random.RandomState(11)
    sig = awgn(sig.astype(np.complex64), 25.0, rng=rng).astype(np.complex64)

    found = _stream_and_decode(demod, decoder, sig)
    assert found, "no packet through the 2^17 STX chain"
    assert min(p.checkPacketData() for p in found) == 0


def test_stx_2e17_spike_tagged(stx_op_conf):
    """A strong burst inside the 2^17 block is clipped and its symbol
    neighbourhood tagged trust -2 (reference
    demodulator_base.py:670-708,818-837)."""
    from pycusdr_tpu.dsp.signal_gen import get_padded_packet, packet_data

    protocol = loadProtocol("bench_FSK")(conf=stx_op_conf)
    demod = STX.Demodulator(stx_op_conf, protocol, "STX")

    bits = packet_data(4000, 5)
    fs = 9600 * 16
    sig, _ = get_padded_packet("FSK", 16, fs, offset_freq=38400,
                               raw_bits=bits, pad=4000)
    sig = sig.astype(np.complex64)
    # burst interference mid-block: 30x amplitude for 64 samples
    mid = len(sig) // 2
    sig[mid : mid + 64] *= 30.0

    step = demod.Nfft - demod.sigOverlap
    sig = np.r_[sig, np.zeros(step - len(sig) % step + step, np.complex64)]
    raw = demod.get_signalBufferHostPointer()
    tagged = 0
    pos = 0
    while pos + step <= len(sig):
        raw[demod.sigOverlap:] = sig[pos : pos + step]
        demod.uploadAndFindCarrier(raw)
        _, _, trust, _ = demod.demodulate()
        tagged += int(np.sum(np.asarray(trust) == -2))
        raw[: demod.sigOverlap] = raw[-demod.sigOverlap :]
        pos += step
    assert tagged > 0, "burst interference not tagged trust -2"
