"""FSK2 matched-filter bank.

Capability parity with ``pyCuSDR/protocol/FSK2_base.py:17-46``: each of
the 2**maskSize bit patterns becomes a continuous-phase FSK template
(+2π·nCycles rad/symbol for a 1, −2π·nCycles for a 0, phase continuous
across symbols, initial offset −bit0·π/2), zero-padded to Nfft,
FFT'd and conjugated for frequency-domain correlation.
"""

import numpy as np

from pycusdr_tpu.protocol.base import ProtocolBase


def fsk_phase_templates(symbols01: np.ndarray, spsym: int, nCycles: float = 0.5) -> np.ndarray:
    """Phase trajectories (num_masks, maskLen*spsym) for FSK bit patterns."""
    wave = np.linspace(1.0 / spsym, 1.0, spsym) * np.pi * 2 * nCycles
    p = symbols01 * 2.0 - 1.0  # (M, L) NRZ
    # Phase at the start of segment j is the accumulated full-symbol
    # excursions of all previous symbols; within segment j the ramp is
    # p_j * wave. A constant -p0*pi/2 offsets the whole trajectory.
    seg_end = wave[-1]
    base = np.cumsum(p * seg_end, axis=1) - p * seg_end  # (M, L) start offsets
    ramps = p[:, :, None] * wave[None, None, :]  # (M, L, spsym)
    phase = base[:, :, None] + ramps
    phase = phase.reshape(p.shape[0], -1)
    phase -= (p[:, :1] * np.pi / 2)  # initial offset from first bit
    return phase


def fft_filter_bank(templates: np.ndarray, Nfft: int) -> np.ndarray:
    """Zero-pad templates to Nfft, FFT and conjugate -> complex64 bank."""
    M = templates.shape[0]
    bank = np.empty((M, Nfft), dtype=np.complex64)
    for i in range(M):
        bank[i] = np.conj(np.fft.fft(templates[i], Nfft)).astype(np.complex64)
    return bank


class FSK2(ProtocolBase):
    name = "FSK2 Base"

    def get_filter(self, Nfft, spsym, maskSize, nCycles=0.5):
        symbols = self._get_xcorrMasks(maskSize)
        phase = fsk_phase_templates(symbols, spsym, nCycles)
        bank = fft_filter_bank(np.exp(1j * phase), Nfft)
        return bank.shape[0], bank
