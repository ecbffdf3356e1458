"""Demodulation-stage device ops: best-Doppler matched filtering, symbol
timing recovery, windowed symbol detection, bit extraction, spike
clipping and SNR.

Each op mirrors one stage of the reference hot path (citations inline)
but is written as pure, statically-shaped jnp so the whole block chain
fuses into a single XLA graph with one host transfer per block.

Complex tensors are carried split as a length-2 ``[re, im]`` axis of
float32 (see ``ops.cfft``) — this TPU backend has no complex dtype, and
split storage keeps the last (lane) axis at the transform length.
"""

import jax
import jax.numpy as jnp

from pycusdr_tpu.ops.cfft import cmul, ifft_unnorm_power_ri, ifft_unnorm_ri, rfft_ri


def threshold_input(sig_ri: jnp.ndarray, scale: float):
    """Two-pass interference spike clipping
    (reference demodulator_base.py:670-708, host-side there; device here).

    sig_ri: (2, N) split complex. Returns (clipped signal, bool mask of
    samples clipped in pass 2).
    """
    absS = jnp.sqrt(sig_ri[0] ** 2 + sig_ri[1] ** 2)
    thr = scale * jnp.mean(absS)
    hit1 = absS > thr
    safe = jnp.where(hit1, absS, 1.0)
    g1 = jnp.where(hit1, thr / safe, 1.0)
    sig1 = sig_ri * g1[None, :]
    abs1 = jnp.where(hit1, thr, absS)

    thr2 = scale * jnp.mean(abs1)
    hit2 = abs1 > thr2
    safe2 = jnp.where(hit2, abs1, 1.0)
    g2 = jnp.where(hit2, thr2 / safe2, 1.0)
    return sig1 * g2[None, :], hit2


def apply_best_doppler(S_ri: jnp.ndarray, masks_ri: jnp.ndarray, shift) -> jnp.ndarray:
    """Lag-domain matched-filter bank at the winning Doppler shift.

    X[m] = IFFT_unnorm(S[(k+shift) mod N] * masks_f[m]) — parity with
    ``multInputVectorWithShiftedMask`` + batched cuFFT inverse
    (cuda_kernels.cu:174-185, demodulator_base.py:776-785).

    S_ri: (2, N); masks_ri: (M, 2, N). Returns (M, 2, N).
    """
    N = S_ri.shape[-1]
    idx = (jnp.arange(N, dtype=jnp.int32) + shift) % N
    Ss = jnp.take(S_ri, idx, axis=-1)  # (2, N)
    pr, pi = cmul(Ss[0][None, :], Ss[1][None, :], masks_ri[:, 0], masks_ri[:, 1])
    return ifft_unnorm_ri(jnp.stack([pr, pi], axis=-2))


def apply_best_doppler_power(S_ri: jnp.ndarray, masks_ri: jnp.ndarray, shift) -> jnp.ndarray:
    """|matched filter bank|² directly: same as ``apply_best_doppler``
    followed by re²+im², but the magnitude is fused into the inverse
    transform's final stage (``cfft.ifft_unnorm_power_ri``) so the
    (M, 2, N) complex lag tensor never exists. The whole demod stage
    only ever consumes the power (abs² symbol metric)."""
    N = S_ri.shape[-1]
    idx = (jnp.arange(N, dtype=jnp.int32) + shift) % N
    Ss = jnp.take(S_ri, idx, axis=-1)
    pr, pi = cmul(Ss[0][None, :], Ss[1][None, :], masks_ri[:, 0], masks_ri[:, 1])
    return ifft_unnorm_power_ri(jnp.stack([pr, pi], axis=-2))


def find_code_rate_and_phase(P2: jnp.ndarray, idx_lo: int, idx_hi: int, Nfft: int,
                             mask_offset: int = 0):
    """Symbol rate + phase from the spectrum of summed matched-filter power.

    Parity with ``sumXCorrBuffMasks`` + R2C FFT + ``findCodeRateAndPhase``
    (cuda_kernels.cu:191-320, demodulator_base.py:711-752): restrict the
    rfft-magnitude argmax to bins [Nfft/(1.1·spsym), Nfft/(0.9·spsym));
    spSym = Nfft/k*, codeOffset = −phase/π·spSym/2 (wrapped positive).

    P2: (M, N) f32 |X|^2. Returns (spSym, codeOffset, peak_val).
    """
    M = P2.shape[0]
    power = jnp.sum(P2[mask_offset : M - mask_offset], axis=0)
    R = rfft_ri(power)  # (2, N//2+1)
    br = R[0, idx_lo:idx_hi]
    bi = R[1, idx_lo:idx_hi]
    band_pow = br * br + bi * bi
    k_rel = jnp.argmax(band_pow)
    val = band_pow[k_rel]
    phase = jnp.arctan2(bi[k_rel], br[k_rel])

    k = (idx_lo + k_rel).astype(jnp.float32)
    spSym = Nfft / k
    codeOffset = -phase / jnp.pi * spSym / 2
    codeOffset = jnp.where(codeOffset < 0, codeOffset + spSym - 1, codeOffset)
    return spSym, codeOffset, val


def find_centres(P2: jnp.ndarray, spSym, codeOffset, *, Nfft: int, windowWidth: int,
                 spsymMin: int, numSymMax: int):
    """Windowed symbol detection (parity: ``findCentres``,
    cuda_kernels.cu:78-146, abs² metric).

    One symbol slot per predicted centre ``x*spSym + codeOffset``; scan a
    ``windowWidth`` window across all mask rows; emit (winning mask,
    centre sample, magnitude). Data-dependent positions are handled as a
    static-shape gather of (numSymMax, W) windows with validity masking —
    the symbol count is returned separately as ``nSym``.

    Returns (symbols i32[numSymMax], centres i32[numSymMax],
             mags f32[numSymMax], nSym i32, spc f32).
    """
    W = windowWidth
    Wl = W // 2
    M = P2.shape[0]

    spc = jnp.maximum(spSym, float(spsymMin))
    x = jnp.arange(numSymMax, dtype=jnp.float32)
    base = x * spc - Wl + codeOffset
    A0 = jnp.trunc(base).astype(jnp.int32)
    comp = jnp.trunc(codeOffset).astype(jnp.int32) - jnp.minimum(A0, 0)
    A = jnp.maximum(A0, 0)
    L = jnp.minimum(A0 + W, Nfft) - A  # per-slot valid window length

    k = jnp.arange(W, dtype=jnp.int32)
    pos = jnp.clip(A[:, None] + k[None, :], 0, Nfft - 1)  # (numSymMax, W)
    valid = (k[None, :] < L[:, None]) & (A[:, None] < Nfft)

    G = jnp.take(P2, pos, axis=1)  # (M, numSymMax, W)
    G = jnp.transpose(G, (1, 0, 2))  # (numSymMax, M, W)
    G = jnp.where(valid[:, None, :], G, -1.0)

    flat = G.reshape(numSymMax, M * W)
    arg = jnp.argmax(flat, axis=1)  # mask-major, first-max tie-break like CUDA
    symbols = (arg // W).astype(jnp.int32)
    maxK = (arg % W).astype(jnp.int32)
    mags = jnp.take_along_axis(flat, arg[:, None], axis=1)[:, 0]

    centres = jnp.trunc(x * spc - Wl + maxK.astype(jnp.float32)).astype(jnp.int32) + comp
    nSym = (Nfft / spc).astype(jnp.int32)
    return symbols, centres, mags, nSym, spc


def extract_bits_lut(symbols: jnp.ndarray, bitLUT: jnp.ndarray) -> jnp.ndarray:
    """Centre-bit LUT path (reference demodulator_base.py:1012-1023)."""
    return jnp.take(bitLUT, symbols, axis=0).astype(jnp.int8)


def extract_bits_nrzs(symbols: jnp.ndarray, symbolLUT: jnp.ndarray):
    """NRZ-S 3-D LUT path for BPSK phase-ambiguity resolution
    (reference demodulator_base.py:1026-1051).

    bits[i] derives from the (symbols[i], symbols[i+1]) transition;
    returns (bits int8[n-1... padded to n], error bool[n]) where a
    transition matching neither table entry is an error (bit forced 0,
    trust −1).
    """
    s_prev = symbols
    s_next = jnp.roll(symbols, -1)
    ones_tbl = jnp.take(symbolLUT[:, 0, :], s_prev, axis=0)  # (n, K)
    zeros_tbl = jnp.take(symbolLUT[:, 1, :], s_prev, axis=0)
    res1 = jnp.any(s_next[:, None] == ones_tbl, axis=1)
    res0 = jnp.any(s_next[:, None] == zeros_tbl, axis=1)
    err = ~(res1 | res0)
    bits = jnp.where(err, 0, res1.astype(jnp.int8)).astype(jnp.int8)
    return bits, err


def dilate_mask_dynamic(mask: jnp.ndarray, halfwidth) -> jnp.ndarray:
    """Binary dilation with a runtime-valued half width via prefix sums.

    Used to tag trust −2 within ±2·spSym of clipped interference peaks
    (reference demodulator_base.py:830-837).
    """
    N = mask.shape[0]
    c = jnp.cumsum(mask.astype(jnp.int32))
    i = jnp.arange(N, dtype=jnp.int32)
    hw = halfwidth.astype(jnp.int32)
    hi = jnp.clip(i + hw, 0, N - 1)
    lo = i - hw - 1
    c_lo = jnp.where(lo >= 0, jnp.take(c, jnp.clip(lo, 0, N - 1)), 0)
    return (jnp.take(c, hi) - c_lo) > 0


def compute_snr(absS: jnp.ndarray, fft_lo, fft_hi, window: int, Nfft: int):
    """SNR from signal bins vs mirrored-spectrum noise bins
    (reference demodulator_base.py:635-667). Circular ranges are
    evaluated with boolean masks so the graph stays statically shaped.
    """
    k = jnp.arange(Nfft, dtype=jnp.int32)

    def circ_mean(a, b):
        a = jnp.mod(a, Nfft)
        span = jnp.mod(b - a, Nfft)
        rel = jnp.mod(k - a, Nfft)
        sel = rel < span
        return jnp.sum(jnp.where(sel, absS, 0.0)) / jnp.maximum(jnp.sum(sel), 1)

    sig = circ_mean(fft_lo - window, fft_hi + window)
    noise = circ_mean(fft_lo - window + Nfft // 2, fft_hi + window + Nfft // 2)
    ratio = sig / noise - 1.0
    return jnp.where(ratio > 0, 20.0 * jnp.log10(jnp.where(ratio > 0, ratio, 1.0)), -jnp.inf)
