"""STX radio backend: no Doppler search (fixed IF shift), interference
spike clipping ON with trust -2 tagging (reference demodulator/STX.py +
demodulator_base.py:670-708,818-837)."""

import numpy as np
import pytest

from pycusdr_tpu.models import STX
from pycusdr_tpu.ops.cfft import c2ri

from conftest import make_fsk_signal


@pytest.fixture(scope="module")
def stx_conf(bench_conf):
    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in bench_conf.items()}
    conf["GPU"] = dict(conf["GPU"])
    conf["GPU"]["STX"] = dict(conf["GPU"]["UHF"], peakThresholdScale=4.5)
    conf["Radios"] = {
        "rangeRateMax": 7500,
        "Rx": {
            "STX": {
                "name": "STX",
                "CUDA_settings": "STX",
                "frequency_Hz": 2.4e9,
                "frequencyOffset_Hz": 38400,
                "baud": 9600,
                "samplesPerSym": 16,
                "doppCarrierSteps": 1,
                "Protocol": "UHF",
                "radioBackend": "STX",
                "voteGroup": "STX",
                "Interfaces": {"RxInPort": "tcp://127.0.0.1:25570",
                               "demodOut": "tcp://localhost:20003"},
            }
        },
    }
    return conf


def test_stx_demodulates_at_fixed_offset(stx_conf):
    from pycusdr_tpu.protocol import loadProtocol

    protocol = loadProtocol("bench_FSK")(conf=stx_conf)
    demod = STX.Demodulator(stx_conf, protocol, "STX")
    assert not demod.spec.doppler_search
    assert not demod.spec.disable_peak_thresholding

    rng = np.random.RandomState(3)
    nbits = demod.Nfft // 16
    bits = rng.randint(0, 2, nbits)
    sig = make_fsk_signal(bits, 16, 38400 / demod.spec.sampleRate, noise_std=0.05)

    fOff, sdev, clipped, snr = demod.uploadAndFindCarrier(sig[: demod.Nfft])
    assert fOff == 0.0  # no search: offset is not estimated
    got, centres, trust, spSym = demod.demodulate()
    assert abs(spSym - 16) < 0.3
    from test_dsp_golden import best_aligned_ber

    ber = best_aligned_ber(got[5:-5], bits[5:], max_shift=80)
    assert ber < 0.02, f"STX demod BER {ber}"


def test_stx_spike_clipping_tags_trust(stx_conf):
    from pycusdr_tpu.protocol import loadProtocol

    protocol = loadProtocol("bench_FSK")(conf=stx_conf)
    demod = STX.Demodulator(stx_conf, protocol, "STX")

    rng = np.random.RandomState(4)
    nbits = demod.Nfft // 16
    bits = rng.randint(0, 2, nbits)
    sig = make_fsk_signal(bits, 16, 38400 / demod.spec.sampleRate, noise_std=0.02)
    sig = sig[: demod.Nfft].copy()
    spike_at = demod.Nfft // 2
    sig[spike_at : spike_at + 8] += 300.0  # massive interference burst

    demod.uploadAndFindCarrier(sig)
    _, centres, trust, _ = demod.demodulate()
    near = np.abs(np.asarray(centres, np.int64) - spike_at) < 4 * 16
    assert np.any(trust[near] == -2), "clipped burst was not trust-tagged"
    far = np.abs(np.asarray(centres, np.int64) - spike_at) > 8 * 16
    assert np.mean(trust[far] > 0) > 0.9, "clipping tagged far-away symbols"
