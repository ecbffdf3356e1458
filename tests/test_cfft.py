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
