"""Doppler search-and-track loop (BASELINE config #3): acquire a
ramping carrier, follow it with the narrow runtime-recentred grid,
reacquire after signal loss."""

import numpy as np
import pytest

from pycusdr_tpu.models.tracking import ACQUIRING, TRACKING, DopplerTracker
from pycusdr_tpu.ops.cfft import c2ri

from conftest import make_fsk_signal


@pytest.fixture(scope="module")
def tracker_env():
    import __graft_entry__ as g

    spec = g.tiny_spec()
    tracker = DopplerTracker(spec=spec, track_bins=8, track_span_bins=16,
                             snr_threshold_db=3.0, lost_limit=3)
    return spec, tracker


def _ramp_blocks(spec, n_blocks, f0, slope_hz_per_block, seed=0, noise=0.05):
    """FSK blocks under a linear Doppler ramp (phase-continuous chirp)."""
    N = spec.Nfft
    fs = spec.sampleRate
    rng = np.random.RandomState(seed)
    nbits = (N * n_blocks) // int(spec.spsym) + 4
    bits = rng.randint(0, 2, nbits)
    base = make_fsk_signal(bits, int(spec.spsym), 0.0, seed=seed, noise_std=noise)
    n = np.arange(N * n_blocks)
    # instantaneous frequency f0 + slope * t(block)
    f_inst = f0 + slope_hz_per_block * (n / N)
    phase = 2 * np.pi * np.cumsum(f_inst) / fs
    sig = (base[: N * n_blocks] * np.exp(1j * phase)).astype(np.complex64)
    truth = f0 + slope_hz_per_block * np.arange(n_blocks)
    return sig.reshape(n_blocks, N), truth


def test_acquire_then_track_ramp(tracker_env):
    spec, tracker = tracker_env
    slope = 100.0  # Hz per block (~2/3 bin) — LEO-ish slew
    blocks, truth = _ramp_blocks(spec, 24, spec.centreFreqOffset - 1200.0, slope)

    modes, est = [], []
    for b, tr in zip(blocks, truth):
        res = tracker.process(c2ri(b))
        modes.append(res["mode"])
        est.append(float(res["doppler_hz"]))

    assert modes[0] == ACQUIRING
    assert TRACKING in modes, "tracker never locked"
    first_track = modes.index(TRACKING)
    assert first_track <= 5

    bin_hz = spec.sampleRate / spec.Nfft
    errs = np.abs(np.asarray(est[first_track:]) - truth[first_track:])
    assert np.median(errs) < 1.5 * bin_hz, f"track error too large: {errs}"
    # the narrow grid really is narrow
    assert tracker.track_spec.num_dopplers < spec.num_dopplers


def test_reacquires_after_loss(tracker_env):
    spec, tracker = tracker_env
    assert tracker.state == TRACKING  # still locked from previous test
    rng = np.random.RandomState(9)
    noise_block = (0.01 * (rng.randn(spec.Nfft) + 1j * rng.randn(spec.Nfft))).astype(np.complex64)
    for _ in range(tracker.lost_limit + 1):
        res = tracker.process(c2ri(noise_block))
    assert tracker.state == ACQUIRING, "tracker did not fall back to acquisition"


def test_full_leo_pass_s_curve():
    """A complete LEO pass: the Doppler follows the classic S-curve
    (fast swing through closest approach). The tracker must stay locked
    through the whole pass and keep its error within ~1 bin."""
    import __graft_entry__ as g

    spec = g.tiny_spec()
    tracker = DopplerTracker(spec=spec, track_bins=8, track_span_bins=16,
                             snr_threshold_db=3.0, lost_limit=3, history=6)

    N = spec.Nfft
    fs = spec.sampleRate
    n_blocks = 60
    rng = np.random.RandomState(11)
    nbits = (N * n_blocks) // int(spec.spsym) + 4
    bits = rng.randint(0, 2, nbits)
    base = make_fsk_signal(bits, int(spec.spsym), 0.0, seed=11, noise_std=0.05)

    # S-curve: doppler = -A * tanh((t - t0)/tau), A = 12 bins
    bin_hz = fs / N
    t = np.arange(N * n_blocks) / N
    A = 12 * bin_hz
    f_inst = spec.centreFreqOffset - A * np.tanh((t - n_blocks / 2) / (n_blocks / 6))
    phase = 2 * np.pi * np.cumsum(f_inst) / fs
    sig = (base[: N * n_blocks] * np.exp(1j * phase)).astype(np.complex64)
    blocks = sig.reshape(n_blocks, N)
    tmid = (np.arange(n_blocks) + 0.5)
    truth = spec.centreFreqOffset - A * np.tanh((tmid - n_blocks / 2) / (n_blocks / 6))

    modes, est = [], []
    for b in blocks:
        res = tracker.process(c2ri(b))
        modes.append(res["mode"])
        est.append(float(res["doppler_hz"]))

    track_frac = np.mean(np.asarray(modes) == TRACKING)
    assert track_frac > 0.8, f"tracker spent only {track_frac:.0%} of the pass locked"
    locked = [i for i, m in enumerate(modes) if m == TRACKING]
    errs = np.abs(np.asarray(est)[locked] - truth[locked])
    assert np.median(errs) < 1.5 * bin_hz, f"median track error {np.median(errs):.0f} Hz"
    assert np.max(errs) < 4 * bin_hz, f"max track error {np.max(errs):.0f} Hz"
