"""Split-complex FFT core (ops/cfft): the TPU replacement for the
reference's cuFFT binding (lib/cufft.py). Golden vs numpy across sizes,
both evaluation paths (Stockham butterflies and the four-step matmul
FFT), batching, and the packed real-input transform."""

import numpy as np
import pytest

import jax

from pycusdr_tpu.ops.cfft import (
    FOUR_STEP_MAX,
    FOUR_STEP_MIN,
    _four_step,
    _stockham,
    band_dft_real,
    c2ri,
    cmul,
    fft_ri,
    ifft_unnorm_ri,
    ri2c,
    rfft_ri,
)


@pytest.mark.parametrize("n", [8, 64, 256, 512, 4096, 65536])
def test_fft_matches_numpy(n):
    rng = np.random.RandomState(n)
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    X = ri2c(jax.jit(fft_ri)(c2ri(x)))
    ref = np.fft.fft(x)
    assert np.max(np.abs(X - ref)) / np.max(np.abs(ref)) < 2e-6


@pytest.mark.parametrize("n", [64, 512, 8192])
def test_ifft_unnormalised(n):
    rng = np.random.RandomState(n + 1)
    x = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
    X = np.fft.fft(x).astype(np.complex64)
    xi = ri2c(jax.jit(ifft_unnorm_ri)(c2ri(X)))
    assert np.max(np.abs(xi - x * n)) / (np.max(np.abs(x)) * n) < 2e-6


@pytest.mark.parametrize("n", [64, 512, 4096, 65536])
def test_rfft_matches_numpy(n):
    rng = np.random.RandomState(n + 2)
    r = rng.randn(n).astype(np.float32)
    R = ri2c(jax.jit(rfft_ri)(r))
    ref = np.fft.rfft(r)
    assert np.max(np.abs(R - ref)) / np.max(np.abs(ref)) < 2e-6
    assert R.shape == (n // 2 + 1,)


@pytest.mark.parametrize("n,lo,hi", [
    (65536, 3724, 4552),   # the flagship timing band (spsym 16)
    (4096, 0, 1),          # DC only
    (4096, 2047, 2049),    # straddling a k2-tile boundary
    (512, 1, 257),         # full lower half, small n
    (65536, 32760, 32769), # top of the rfft range incl. Nyquist
])
def test_band_dft_real_matches_rfft(n, lo, hi):
    rng = np.random.RandomState(lo + 5)
    r = rng.randn(n).astype(np.float32)
    B = ri2c(jax.jit(lambda x: band_dft_real(x, lo, hi))(r))
    ref = np.fft.rfft(r)[lo:hi]
    assert B.shape == (hi - lo,)
    assert np.max(np.abs(B - ref)) / np.max(np.abs(np.fft.rfft(r))) < 2e-6


def test_band_dft_real_batched():
    rng = np.random.RandomState(11)
    r = rng.randn(3, 4096).astype(np.float32)
    B = ri2c(jax.jit(lambda x: band_dft_real(x, 100, 400))(r))
    ref = np.stack([np.fft.rfft(row)[100:400] for row in r])
    assert np.max(np.abs(B - ref)) / np.max(np.abs(ref)) < 2e-6


def test_both_paths_agree():
    """Stockham and four-step must agree inside the crossover band."""
    n = 4096
    rng = np.random.RandomState(7)
    re = rng.randn(n).astype(np.float32)
    im = rng.randn(n).astype(np.float32)
    sr, si = _stockham(re, im, n, -1.0)
    fr, fi = _four_step(re, im, n, -1.0)
    ref = np.abs(np.asarray(sr) + 1j * np.asarray(si)).max()
    err = np.max(np.abs((np.asarray(sr) - np.asarray(fr))
                        + 1j * (np.asarray(si) - np.asarray(fi))))
    assert err / ref < 2e-6
    assert FOUR_STEP_MIN <= n <= FOUR_STEP_MAX


@pytest.mark.parametrize("n", [256, 4096, 65536])
def test_block_four_step_route(n):
    """The one-block-matmul-per-stage four-step (FOUR_STEP_ROUTE='block')
    matches numpy for the forward, real-input forward, and power-fused
    inverse transforms."""
    import pycusdr_tpu.ops.cfft as cf

    rng = np.random.RandomState(n + 9)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    old = cf.FOUR_STEP_ROUTE
    cf.FOUR_STEP_ROUTE = "block"
    try:
        X = ri2c(np.asarray(cf.fft_ri(c2ri(x))))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        assert np.max(np.abs(X - ref)) / np.max(np.abs(ref)) < 2e-6

        R = ri2c(np.asarray(cf.fft_real_ri(np.asarray(x.real, np.float32))))
        rref = np.fft.fft(x.real.astype(np.float64), axis=-1)
        assert np.max(np.abs(R - rref)) / np.max(np.abs(rref)) < 2e-6

        P = np.asarray(cf.ifft_unnorm_power_ri(c2ri(x)))
        pref = np.abs(np.fft.ifft(x.astype(np.complex128), axis=-1) * n) ** 2
        assert np.max(np.abs(P - pref)) / pref.max() < 4e-6
    finally:
        cf.FOUR_STEP_ROUTE = old


def test_batched_and_multidim():
    rng = np.random.RandomState(8)
    x = (rng.randn(3, 5, 1024) + 1j * rng.randn(3, 5, 1024)).astype(np.complex64)
    X = ri2c(jax.jit(fft_ri)(c2ri(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(X - ref)) / np.max(np.abs(ref)) < 2e-6


def test_cmul():
    a = np.array([1.0 + 2j, 3 - 1j])
    b = np.array([0.5 - 1j, -2 + 0.25j])
    r, i = cmul(a.real, a.imag, b.real, b.imag)
    np.testing.assert_allclose(np.asarray(r) + 1j * np.asarray(i), a * b)


def test_roundtrip_conversions():
    rng = np.random.RandomState(9)
    x = (rng.randn(4, 100) + 1j * rng.randn(4, 100)).astype(np.complex64)
    np.testing.assert_array_equal(ri2c(c2ri(x)), x)


def test_doppler_corr_route_matches_matmul():
    """The FFT-correlation Doppler energy equals the shifted matmul."""
    import jax.numpy as jnp

    from pycusdr_tpu.ops.doppler_search import (
        doppler_energy_corr,
        doppler_energy_matmul,
        make_qf_ri,
        make_shift_gather_indices,
    )

    N, M, D = 4096, 8, 48
    rng = np.random.RandomState(11)
    masks_f = (rng.randn(M, N) + 1j * rng.randn(M, N)).astype(np.complex64)
    P = np.abs(rng.randn(N)).astype(np.float32) * 100
    shifts = rng.randint(0, N, D).astype(np.int32)

    QT = (np.abs(masks_f) ** 2).T.astype(np.float32)
    sidx = make_shift_gather_indices(N, shifts)
    a = np.asarray(doppler_energy_matmul(jnp.asarray(P), jnp.asarray(QT), jnp.asarray(sidx)))
    b = np.asarray(doppler_energy_corr(jnp.asarray(P), jnp.asarray(make_qf_ri(masks_f)),
                                       jnp.asarray(shifts)))
    np.testing.assert_allclose(a, b, rtol=2e-4)

    # runtime grid recentre matches a pre-shifted grid
    c = np.int32(37)
    sidx_c = make_shift_gather_indices(N, (shifts + c) % N)
    a2 = np.asarray(doppler_energy_matmul(jnp.asarray(P), jnp.asarray(QT), jnp.asarray(sidx_c)))
    b2 = np.asarray(doppler_energy_corr(jnp.asarray(P), jnp.asarray(make_qf_ri(masks_f)),
                                        jnp.asarray(shifts), jnp.asarray(c)))
    np.testing.assert_allclose(a2, b2, rtol=2e-4)


def test_doppler_corr_dft_route_matches_matmul():
    """The pruned-output DFT Doppler energy (the batched-throughput
    route) equals the shifted matmul, with and without a runtime
    (traced) grid recentre."""
    import jax
    import jax.numpy as jnp

    from pycusdr_tpu.ops.doppler_search import (
        doppler_energy_corr_dft,
        doppler_energy_matmul,
        make_corr_dft_F,
        make_qf_ri,
        make_shift_gather_indices,
    )

    N, M, D = 4096, 8, 48
    rng = np.random.RandomState(11)
    masks_f = (rng.randn(M, N) + 1j * rng.randn(M, N)).astype(np.complex64)
    P = np.abs(rng.randn(N)).astype(np.float32) * 100
    shifts = rng.randint(0, N, D).astype(np.int32)

    QT = (np.abs(masks_f) ** 2).T.astype(np.float32)
    qf = jnp.asarray(make_qf_ri(masks_f))
    F = jnp.asarray(make_corr_dft_F(N, shifts))
    a = np.asarray(doppler_energy_matmul(
        jnp.asarray(P), jnp.asarray(QT),
        jnp.asarray(make_shift_gather_indices(N, shifts))))
    b = np.asarray(doppler_energy_corr_dft(jnp.asarray(P), qf, F))
    np.testing.assert_allclose(a, b, rtol=2e-4)

    # traced runtime recentre (the tracking path) matches a
    # pre-shifted grid, jitted so the phasor path actually traces
    c = np.int32(37)
    sidx_c = make_shift_gather_indices(N, (shifts + c) % N)
    a2 = np.asarray(doppler_energy_matmul(
        jnp.asarray(P), jnp.asarray(QT), jnp.asarray(sidx_c)))
    f = jax.jit(lambda p, cc: doppler_energy_corr_dft(p, qf, F, cc))
    b2 = np.asarray(f(jnp.asarray(P), jnp.asarray(c)))
    np.testing.assert_allclose(a2, b2, rtol=2e-4)


def test_block_graph_corr_route_golden():
    """A wide-grid spec (corr route) still matches the numpy reference."""
    import dataclasses

    import __graft_entry__ as g
    from pycusdr_tpu.dsp.block import CORR_ROUTE_MIN_D, build_process_block
    from pycusdr_tpu.dsp.reference import demod_block_numpy
    from pycusdr_tpu.dsp.spec import build_doppler_grid

    spec0 = g.tiny_spec()
    shifts, hz_lut, off_idx, fs = build_doppler_grid(
        spec0.Nfft, 48, spec0.baudRate, spec0.spsym, 437.3e6,
        spec0.centreFreqOffset, 7500.0)
    spec = dataclasses.replace(spec0, num_dopplers=48, dopp_shifts=shifts,
                               dopp_hz_lut=hz_lut, dopp_array_offset=0)
    assert spec.D >= CORR_ROUTE_MIN_D

    from conftest import make_fsk_signal
    rng = np.random.RandomState(21)
    bits = rng.randint(0, 2, spec.Nfft // int(spec.spsym))
    sig = make_fsk_signal(bits, int(spec.spsym), spec.centreFreqOffset / fs,
                          noise_std=0.05, seed=3)

    ref = demod_block_numpy(spec, sig)
    jx = {k: np.asarray(v) for k, v in build_process_block(spec)(c2ri(sig)).items()}
    assert abs(float(jx["doppler_hz"]) - ref["doppler_hz"]) < 1.0
    assert int(jx["shift"]) == ref["shift"]
    n = int(jx["nSym"])
    assert np.array_equal(jx["bits"][:n], ref["bits"][:n])
