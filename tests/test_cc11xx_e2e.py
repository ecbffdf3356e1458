"""CC11xx end-to-end acceptance (BASELINE config #1): the real
protocol's Tx chain (length byte + CRC-16 + PN9 whitening + preamble/
sync framing + GFSK LUT modulation) through the channel into the
streaming demodulator and frame decoder — payload recovered with CRC
intact, bit-exact."""

import numpy as np
import pytest

from pycusdr_tpu.decode import Decoder
from pycusdr_tpu.models import UHF
from pycusdr_tpu.protocol import loadProtocol
from pycusdr_tpu.tx.modulator import Modulator


@pytest.fixture(scope="module")
def cc_conf(bench_conf):
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in bench_conf.items()}
    conf["Main"] = dict(conf["Main"], protocols={"UHF": "CC11xx"})
    conf["Radios"] = {
        "rangeRateMax": 7500,
        "Protocol": {
            "rx_preamble": ["0xaa", "0xaa", "0xaa", "0xaa"],
            "rx_sync_seq": ["0xd6", "0xba", "0xd6", "0xba"],
            "tx_preamble": ["0xaa"],
            "tx_num_preambles": 10,
            "tx_sync_seq": ["0xd6", "0xba", "0xd6", "0xba"],
        },
        "Rx": {
            "UHF-H": {
                "name": "UHF", "CUDA_settings": "UHF",
                "frequency_Hz": 437.3e6, "frequencyOffset_Hz": 38400,
                "baud": 9600, "samplesPerSym": 16, "doppCarrierSteps": 16,
                "Protocol": "UHF", "radioBackend": "UHF", "voteGroup": "UHF",
                "Interfaces": {"RxInPort": "tcp://127.0.0.1:25580",
                               "demodOut": "tcp://localhost:20003"},
            }
        },
        "Tx": {
            "UHF": {
                "baud": 9600, "samplesPerSym": 16,
                "frequency_Hz": 437.3e6, "frequencyOffset_Hz": 38400,
                "Protocol": "UHF",
            }
        },
    }
    return conf


def test_cc11xx_tx_to_rx_bit_exact(cc_conf):
    from pycusdr_tpu.dsp.signal_gen import awgn

    protocol = loadProtocol("CC11xx")(conf=cc_conf)
    mod = Modulator(cc_conf, cc_conf["Radios"]["Tx"]["UHF"], protocol)
    demod = UHF.Demodulator(cc_conf, protocol, "UHF-H")
    decoder = Decoder(cc_conf.get("decoder", {}), protocol)

    payload = np.r_[np.array([7], np.uint8), np.arange(1, 40, dtype=np.uint8)]
    wave = mod.encodeAndModulate(payload)

    rng = np.random.RandomState(1)
    sig = awgn(wave.astype(np.complex64), 20.0, rng=rng).astype(np.complex64)

    blockN, ov = demod.Nfft, demod.sigOverlap
    step = blockN - ov
    nblk = int(np.ceil(len(sig) / step)) + 2
    sig = np.r_[sig, np.zeros(nblk * step - len(sig) + step, np.complex64)]
    raw = demod.get_signalBufferHostPointer()

    found = []
    pos = 0
    while pos + step <= len(sig):
        raw[ov:] = sig[pos : pos + step]
        fOff, _, _, snr = demod.uploadAndFindCarrier(raw)
        bits, _, _, _ = demod.demodulate()
        pkts, _, _ = decoder.findFrames(bits, 0)
        found.extend(pkts)
        raw[:ov] = raw[-ov:]
        pos += step

    assert found, "no CC11xx packet found"
    ok = False
    for p in found:
        data, crcError, _ = p.getBinaryData()
        if not crcError and np.array_equal(np.asarray(data), payload):
            ok = True
    assert ok, "no bit-exact CRC-clean CC11xx packet"
