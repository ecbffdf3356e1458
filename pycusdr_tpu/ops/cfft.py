"""Split-complex FFT and complex arithmetic on real-only TPU backends.

TPU has no native complex dtype (and this backend rejects complex64
outright), so the framework carries complex tensors as a leading
length-2 axis ``[re, im]`` of float32 and implements the FFT directly:
an iterative Stockham autosort radix-2 transform, log2(N) fully
vectorised VPU stages with per-stage twiddle tables precomputed in
numpy. Batch dimensions broadcast, shapes are static, and the whole
transform inlines into the surrounding XLA graph (no plans, no
libraries — the TPU replacement for the reference's cuFFT binding,
``lib/cufft.py``).

Convention: a "split" array has shape (..., 2, N) — re = x[..., 0, :],
im = x[..., 1, :]. N must be a power of two.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def c2ri(x: np.ndarray) -> np.ndarray:
    """complex host array (..., N) -> float32 split array (..., 2, N)."""
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-2).astype(np.float32)


def ri2c(x) -> np.ndarray:
    """split array (..., 2, N) (device or host) -> complex64 host array."""
    x = np.asarray(x)
    return (x[..., 0, :] + 1j * x[..., 1, :]).astype(np.complex64)


def cmul(ar, ai, br, bi):
    """Elementwise complex multiply on split parts."""
    return ar * br - ai * bi, ar * bi + ai * br


def cmag2(ar, ai):
    return ar * ar + ai * ai


@lru_cache(maxsize=None)
def _twiddles(n: int, sign: float):
    """Per-stage Stockham twiddle tables for length-n radix-2 FFT.

    Stage t (t = 0..p-1) has l = n >> (t+1) groups; twiddle_j =
    exp(sign*2πi·j/(2l)) for j in [0, l). Returned as float32
    (re, im) pairs shaped (l, 1) for broadcast against (..., l, m).
    """
    p = n.bit_length() - 1
    assert 1 << p == n, f"FFT length {n} is not a power of two"
    out = []
    l = n // 2
    while l >= 1:
        j = np.arange(l)
        w = np.exp(sign * 2j * np.pi * j / (2 * l))
        # cache plain numpy (jit traces embed them as constants; caching
        # device arrays created mid-trace would leak tracers)
        out.append(
            (w.real.astype(np.float32)[:, None], w.imag.astype(np.float32)[:, None])
        )
        l //= 2
    return out


#: log2 bias on the four-step's N1 factor: n1 = 2^(p//2 + bias).
#: Probed on chip at the flagship shape, DOCUMENTED NEGATIVE RESULT:
#: a first pass (bias order 0,+1,−1,+2) read +1 at 795 vs 716 Msps at
#: B=16, but the reversed-order confirmation read the OPPOSITE
#: (bias 0: 772.7 / 812.2 / 371.3 at B=16 / B=64-chunked / B=1 vs
#: bias +1: 741.1 / 772.1 / 392.1) — the apparent win was tunnel-window
#: drift, and −1/+2 lose in both passes. The balanced √N split stays
#: the default; the knob (env PYCUSDR_FOUR_STEP_N1_BIAS) remains for
#: re-probing on other chips. Round-5 addendum: bias −1 (N1=128 at
#: N=2^16) is a REAL ~8-17% win at B=1 (two interleaved windows, 0.832
#: and 0.921 time ratios, probe_b1_routes_r5.py) but stays OFF: it
#: loses at B=16/64, and a split-by-batch N1 choice would break the
#: vmapped-vs-single bit identity the mixed per-block/batched streaming
#: runtime depends on. Opt in for single-shape offline use only.
#: The env var is sampled at every trace
#: (i.e. inside _pick_n1, which only runs when a graph is traced), so a
#: harness may set it after importing the package; the module global is
#: the fallback for programmatic override.
import os as _os

FOUR_STEP_N1_LOG_BIAS = 0


def _pick_n1(n: int) -> int:
    bias = int(_os.environ.get("PYCUSDR_FOUR_STEP_N1_BIAS",
                               str(FOUR_STEP_N1_LOG_BIAS)))
    p = n.bit_length() - 1
    return 1 << max(1, min(p - 1, p // 2 + bias))


def _four_step_consts(n: int, sign: float):
    """Constants for the four-step (Cooley-Tukey N1xN2) matmul FFT.

    Returns (N1, N2, W1 (re, im) [k1, n1], T (re, im) [k1, n2],
    W2 (re, im) [k2, n2]) as float32 numpy, cached per (length, split)."""
    return _four_step_consts_n1(n, sign, _pick_n1(n))


@lru_cache(maxsize=None)
def _four_step_consts_n1(n: int, sign: float, n1: int):
    n2 = n // n1
    k1, nn1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    W1 = np.exp(sign * 2j * np.pi * k1 * nn1 / n1)
    k1g, n2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    T = np.exp(sign * 2j * np.pi * k1g * n2g / n)
    k2, nn2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    W2 = np.exp(sign * 2j * np.pi * k2 * nn2 / n2)
    f = np.float32
    return (n1, n2,
            (W1.real.astype(f), W1.imag.astype(f)),
            (T.real.astype(f), T.imag.astype(f)),
            (W2.real.astype(f), W2.imag.astype(f)))


def _four_step(re, im, n: int, sign: float):
    """Four-step FFT over the last axis: two N1/N2-point DFT stages as
    MXU matmuls plus an elementwise twiddle — the TPU-native evaluation
    (dense DFT factors keep the systolic array busy instead of 17
    memory-bound VPU butterfly passes).

    X[N1*k2 + k1] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    * sum_{n1} x[N2*n1 + n2] W_{N1}^{n1 k1}

    ``im=None`` marks a real input: stage 1 drops the two imaginary
    matmuls (25% of the transform's FLOPs).
    """
    n1, n2, (w1r, w1i), (tr, ti), (w2r, w2i) = _four_step_consts(n, sign)
    batch = re.shape[:-1]
    xr = re.reshape(batch + (n1, n2))

    def mm(a, b):  # (k, c) x (..., c, m) -> (..., k, m)
        return _mm("kc,...cm->...km", a, b)

    # stage 1: DFT over n1 -> A[k1, n2]
    if im is None:
        ar = mm(w1r, xr)
        ai = mm(w1i, xr)
    else:
        xi = im.reshape(batch + (n1, n2))
        ar = mm(w1r, xr) - mm(w1i, xi)
        ai = mm(w1r, xi) + mm(w1i, xr)
    # twiddle
    br, bi = cmul(ar, ai, tr, ti)
    # stage 2: DFT over n2 -> C[k2, k1]; output index k = N1*k2 + k1
    cr = (_mm("kc,...mc->...km", w2r, br) - _mm("kc,...mc->...km", w2i, bi))
    ci = (_mm("kc,...mc->...km", w2r, bi) + _mm("kc,...mc->...km", w2i, br))
    return cr.reshape(batch + (n,)), ci.reshape(batch + (n,))


def _four_step_block_consts(n: int, sign: float):
    """Block-real factor matrices for the one-matmul-per-stage four-step:
    stage 1 as [ar; ai] = W1B @ [xr; xi] with W1B = [[W1r, -W1i],
    [W1i, W1r]] (2n1, 2n1); stage 2 contracts the stacked last axis,
    [cr; ci](k,m) = Σ_c W2B[c,k]·[br|bi](m,c) with W2B (2n2, 2n2).

    The cache key must include the N1 split (it follows the trace-time
    ``_pick_n1`` env knob): keying on (n, sign) alone would pin the
    first-traced split forever and silently ignore a later bias change
    on this route only."""
    return _four_step_block_consts_n1(n, sign, _pick_n1(n))


@lru_cache(maxsize=None)
def _four_step_block_consts_n1(n: int, sign: float, n1_pick: int):
    n1, n2, (w1r, w1i), T, (w2r, w2i) = _four_step_consts_n1(n, sign, n1_pick)
    f = np.float32
    W1B = np.block([[w1r, -w1i], [w1i, w1r]]).astype(f)
    W1RB = np.concatenate([w1r, w1i], axis=0).astype(f)  # real input
    W2B = np.block([[w2r.T, w2i.T], [-w2i.T, w2r.T]]).astype(f)
    return n1, n2, W1B, W1RB, T, W2B


def _four_step_block(re, im, n: int, sign: float, power_only=False):
    """Four-step FFT with each complex DFT stage as ONE real block
    matmul of doubled dimension instead of four n×n matmuls — same
    FLOPs, 2× larger MXU tiles (wins when the per-matmul shape is too
    small to fill the systolic array, i.e. small batch). Not bit-
    identical to ``_four_step`` (the block contraction sums re/im
    products in one accumulation), so a route choice applies to the
    whole build (``FOUR_STEP_ROUTE``).

    ``im=None`` marks real input (stage 1 contracts only xr).
    ``power_only=True`` returns |X|² fused (the mask-bank consumer).
    """
    n1, n2, W1B, W1RB, (tr, ti), W2B = _four_step_block_consts(n, sign)
    batch = re.shape[:-1]
    xr = re.reshape(batch + (n1, n2))
    if im is None:
        a = _mm("kc,...cm->...km", W1RB, xr)
    else:
        xs = jnp.concatenate([xr, im.reshape(batch + (n1, n2))], axis=-2)
        a = _mm("kc,...cm->...km", W1B, xs)
    br, bi = cmul(a[..., :n1, :], a[..., n1:, :], tr, ti)
    bs = jnp.concatenate([br, bi], axis=-1)  # (..., n1, 2n2)
    c = _mm("ck,...mc->...km", W2B, bs)
    cr, ci = c[..., :n2, :], c[..., n2:, :]  # (..., k2, k1): X[n1·k2+k1]
    if power_only:
        return (cr * cr + ci * ci).reshape(batch + (n,))
    return cr.reshape(batch + (n,)), ci.reshape(batch + (n,))


# Below this length the O(N^2/sqrt(N)) matmul flops beat HBM-bound
# butterflies; above it the Stockham path would win on flops but lose
# badly on memory traffic. 2^18 keeps the DFT factors <= 512x512.
FOUR_STEP_MAX = 1 << 18
FOUR_STEP_MIN = 1 << 8

#: four-step evaluation strategy: "split4" = four n×n real matmuls per
#: complex DFT stage; "block" = one 2n×2n block matmul per stage (same
#: FLOPs, bigger MXU tiles, half the operand re-reads).
#:
#: "block" measured +2.7% at the production B=16 shape on chip (818 ->
#: 840 Msps, same window) and passed the full BER-waterfall gate
#: (results/ber_delta_fourstep_block.npz: max |ΔBER| 1.4e-5, found-
#: rates identical at every point incl. the GMSK cliff) — but it BREAKS
#: the vmapped-vs-single bit-identity the streaming runtime depends on:
#: XLA tiles the doubled contraction differently per batch shape, a
#: ~1-ulp flip in the timing-band argmax moves the whole symbol-slot
#: grid, and a stream that mixes per-block and batched backlog
#: dispatches (runtime/demodulator_process.py) would heal across
#: slightly divergent bit streams. split4 keeps every dispatch shape
#: bit-identical (exactness-tested); "block" stays opt-in for
#: single-shape offline use.
FOUR_STEP_ROUTE = "split4"

#: operand dtype for the dense DFT-factor matmuls: "float32" (default)
#: or "bfloat16". bf16 operands halve the matmul stages' HBM bytes and
#: run the MXU at its (higher) bf16 roof; accumulation stays f32
#: (``preferred_element_type``), so only the operand quantization
#: (8 mantissa bits) differs. Signal-quality impact is gated by the
#: BER-delta harness (``bench/ber_delta.py --matmul-dtype bfloat16``);
#: graphs that require exact integer arithmetic (one-hot selects,
#: payload packing) never route through this flag. Read at TRACE time —
#: set via ``matmul_dtype(...)`` or build graphs with
#: ``dsp.block.build_process_block(..., fft_dtype="bfloat16")``.
MATMUL_DTYPE = "float32"


def _mm_dt():
    return jnp.bfloat16 if MATMUL_DTYPE == "bfloat16" else jnp.float32


class matmul_dtype:
    """Scoped override of MATMUL_DTYPE (use around graph TRACING —
    i.e. around the build for jit=False graphs, or around the first
    call for jitted ones; ``dsp.block.build_process_block`` wraps its
    graph so the flag is pinned at build time regardless)."""

    def __init__(self, dt: str):
        if dt not in ("float32", "bfloat16"):
            raise ValueError(f"unknown matmul dtype {dt!r}")
        self.dt = dt

    def __enter__(self):
        global MATMUL_DTYPE
        self.old = MATMUL_DTYPE
        MATMUL_DTYPE = self.dt
        return self

    def __exit__(self, *exc):
        global MATMUL_DTYPE
        MATMUL_DTYPE = self.old
        return False


def _mm(sub: str, a, b):
    """DFT-factor matmul honouring MATMUL_DTYPE, f32 accumulation."""
    dt = _mm_dt()
    return jnp.einsum(sub, a.astype(dt), b.astype(dt),
                      preferred_element_type=jnp.float32)


def _stockham(re, im, n: int, sign: float):
    """Radix-2 Stockham autosort FFT over the last axis (length n)."""
    tw = _twiddles(n, sign)
    batch = re.shape[:-1]
    l, m = n // 2, 1
    for wr, wi in tw:
        a_r = re.reshape(batch + (2, l, m))
        a_i = im.reshape(batch + (2, l, m))
        c0r, c1r = a_r[..., 0, :, :], a_r[..., 1, :, :]
        c0i, c1i = a_i[..., 0, :, :], a_i[..., 1, :, :]
        sr, si = c0r + c1r, c0i + c1i
        dr, di = c0r - c1r, c0i - c1i
        tr, ti = cmul(dr, di, wr, wi)
        # B[j, 0, k] = sum; B[j, 1, k] = w_j * diff  -> (l, 2, m)
        br = jnp.stack([sr, tr], axis=-2).reshape(batch + (n,))
        bi = jnp.stack([si, ti], axis=-2).reshape(batch + (n,))
        re, im = br, bi
        l //= 2
        m *= 2
    return re, im


def _fft_core(re, im, n: int, sign: float):
    if FOUR_STEP_MIN <= n <= FOUR_STEP_MAX:
        if FOUR_STEP_ROUTE == "block":
            return _four_step_block(re, im, n, sign)
        return _four_step(re, im, n, sign)
    return _stockham(re, im, n, sign)


def fft_ri(x):
    """Forward FFT of a split array (..., 2, N) -> (..., 2, N)."""
    n = x.shape[-1]
    re, im = _fft_core(x[..., 0, :], x[..., 1, :], n, -1.0)
    return jnp.stack([re, im], axis=-2)


def fft_real_ri(x):
    """Forward FFT of a REAL array (..., N) -> (..., 2, N): the
    four-step stage 1 skips its two imaginary-part matmuls (the hot
    consumer is the Doppler correlation's FFT of the power spectrum)."""
    n = x.shape[-1]
    if FOUR_STEP_MIN <= n <= FOUR_STEP_MAX:
        if FOUR_STEP_ROUTE == "block":
            re, im = _four_step_block(x, None, n, -1.0)
        else:
            re, im = _four_step(x, None, n, -1.0)
    else:
        re, im = _stockham(x, jnp.zeros_like(x), n, -1.0)
    return jnp.stack([re, im], axis=-2)


def ifft_unnorm_ri(x):
    """Unnormalised inverse FFT (matches cuFFT's inverse, i.e. N·ifft)."""
    n = x.shape[-1]
    re, im = _fft_core(x[..., 0, :], -x[..., 1, :], n, -1.0)
    return jnp.stack([re, -im], axis=-2)


def ifft_unnorm_power_ri(x):
    """|N·ifft(x)|² with the magnitude fused into the transform's last
    stage — the (..., 2, N) complex lag tensor never materializes.

    This is the demodulation hot path's consumer shape: the matched
    filter bank only needs the lag-domain POWER (abs² symbol metric,
    cuda_kernels.cu:78-146), so the final stack+square of
    ``ifft_unnorm_ri`` is wasted traffic.
    """
    n = x.shape[-1]
    re, im = x[..., 0, :], -x[..., 1, :]
    if FOUR_STEP_MIN <= n <= FOUR_STEP_MAX:
        if FOUR_STEP_ROUTE == "block":
            return _four_step_block(re, im, n, -1.0, power_only=True)
        n1, n2, (w1r, w1i), (tr, ti), (w2r, w2i) = _four_step_consts(n, -1.0)
        batch = re.shape[:-1]
        xr = re.reshape(batch + (n1, n2))
        xi = im.reshape(batch + (n1, n2))

        def mm(a, b):
            return _mm("kc,...cm->...km", a, b)

        ar = mm(w1r, xr) - mm(w1i, xi)
        ai = mm(w1r, xi) + mm(w1i, xr)
        br, bi = cmul(ar, ai, tr, ti)
        cr = (_mm("kc,...mc->...km", w2r, br) - _mm("kc,...mc->...km", w2i, bi))
        ci = (_mm("kc,...mc->...km", w2r, bi) + _mm("kc,...mc->...km", w2i, br))
        return (cr * cr + ci * ci).reshape(batch + (n,))
    rr, ii = _stockham(re, im, n, -1.0)
    return rr * rr + ii * ii


def ifft_unnorm_power_colreduce_ri(x, sum_lo: int, sum_hi: int):
    """Mask-axis reductions of |N·ifft(x)|² fused into the transform —
    the (M, N) power tensor never reaches HBM (VERDICT r3 #1).

    ``x``: (..., M, 2, N) split spectra (M = mask axis). Returns
    ``(colsum, colmax, colargmax)``, each (..., N):

    - ``colsum[n]  = Σ_{m in [sum_lo, sum_hi)} |X_m[n]|²`` — the symbol-
      timing power waveform (reference ``sumXCorrBuffMasks``,
      cuda_kernels.cu:191-205, mask subset via CODE_SEARCH_MASK_OFFSET);
    - ``colmax / colargmax`` — per-position max/argmax over ALL masks
      with the lowest mask winning ties (reference ``findCentres`` mask
      loop, cuda_kernels.cu:78-146) — symbol detection's first step.

    These are the ONLY consumers of the matched-filter power
    (dsp/block.py), and each reduces over the mask axis immediately, so
    materializing (M, N) just to re-read it twice is pure HBM traffic
    (~33 MB/dispatch at flagship B=16). Here the reductions consume the
    four-step's pre-reshape (..., M, k2, k1) power tiles directly: XLA
    fuses square + all three reductions into one multi-output pass over
    the stage-2 matmul outputs, writing 3 N-vectors instead of an (M, N)
    matrix. Bit-identical to reducing ``ifft_unnorm_power_ri``'s result
    (same route, same floats, same reduction axis order —
    exactness-tested in tests/test_dsp_golden.py).
    """
    n = x.shape[-1]
    re, im = x[..., 0, :], -x[..., 1, :]
    if FOUR_STEP_MIN <= n <= FOUR_STEP_MAX:
        batch = re.shape[:-1]
        if FOUR_STEP_ROUTE == "block":
            n1, n2, W1B, W1RB, (tr, ti), W2B = _four_step_block_consts(n, -1.0)
            xr = re.reshape(batch + (n1, n2))
            xs = jnp.concatenate([xr, im.reshape(batch + (n1, n2))], axis=-2)
            a = _mm("kc,...cm->...km", W1B, xs)
            br, bi = cmul(a[..., :n1, :], a[..., n1:, :], tr, ti)
            bs = jnp.concatenate([br, bi], axis=-1)
            c = _mm("ck,...mc->...km", W2B, bs)
            cr, ci = c[..., :n2, :], c[..., n2:, :]
        else:
            n1, n2, (w1r, w1i), (tr, ti), (w2r, w2i) = _four_step_consts(n, -1.0)
            xr = re.reshape(batch + (n1, n2))
            xi = im.reshape(batch + (n1, n2))
            ar = _mm("kc,...cm->...km", w1r, xr) - _mm("kc,...cm->...km", w1i, xi)
            ai = _mm("kc,...cm->...km", w1r, xi) + _mm("kc,...cm->...km", w1i, xr)
            br, bi = cmul(ar, ai, tr, ti)
            cr = (_mm("kc,...mc->...km", w2r, br) - _mm("kc,...mc->...km", w2i, bi))
            ci = (_mm("kc,...mc->...km", w2r, bi) + _mm("kc,...mc->...km", w2i, br))
        power = cr * cr + ci * ci  # (..., M, k2, k1); k = n1*k2 + k1
        out_shape = power.shape[:-3] + (n,)
        colsum = power[..., sum_lo:sum_hi, :, :].sum(axis=-3).reshape(out_shape)
        colmax = power.max(axis=-3).reshape(out_shape)
        colargmax = power.argmax(axis=-3).astype(jnp.int32).reshape(out_shape)
        return colsum, colmax, colargmax
    rr, ii = _stockham(re, im, n, -1.0)
    power = rr * rr + ii * ii  # (..., M, N)
    return (power[..., sum_lo:sum_hi, :].sum(axis=-2),
            power.max(axis=-2),
            power.argmax(axis=-2).astype(jnp.int32))


@lru_cache(maxsize=None)
def _band_dft_consts(n: int, k2_lo: int, k2_hi: int, n1: int):
    """Constants for the pruned-output four-step band DFT: full W1 and
    twiddle as in ``_four_step_consts`` but W2 restricted to output
    tile rows k2 in [k2_lo, k2_hi)."""
    n1, n2, W1, T, (w2r, w2i) = _four_step_consts_n1(n, -1.0, n1)
    return n1, n2, W1, T, (w2r[k2_lo:k2_hi], w2i[k2_lo:k2_hi])


def band_dft_real(x_real, lo: int, hi: int):
    """Forward-DFT bins [lo, hi) of a REAL input — (..., N) f32 ->
    (..., 2, hi-lo) split spectrum, identical to ``rfft_ri(x)[...,
    lo:hi]``.

    Output-pruned four-step: the band maps to a handful of k2 tile rows
    (k = N1*k2 + k1), so stage 2 computes only ceil(band/N1) of the N2
    output tiles, and the real input needs just TWO stage-1 matmuls
    instead of the packed rfft's four-plus-unpack. For the symbol-timing
    search (reference restricts its argmax to bins
    [Nfft/(1.1·spSym), Nfft/(0.9·spSym)), cuda_kernels.cu:236-320) this
    deletes ~97% of the transform's output work — the band is ~1-2 k2
    tiles of a 2^16 transform.
    """
    n = x_real.shape[-1]
    assert 0 <= lo < hi <= n // 2 + 1, (lo, hi, n)
    n1 = _pick_n1(n)
    k2_lo, k2_hi = lo // n1, (hi - 1) // n1 + 1
    n1_, n2, (w1r, w1i), (tr, ti), (w2r, w2i) = _band_dft_consts(n, k2_lo, k2_hi, n1)
    batch = x_real.shape[:-1]
    x = x_real.reshape(batch + (n1, n2))

    # stage 1 on a real signal: A = W1 @ x (complex x real = 2 matmuls)
    ar = _mm("kc,...cm->...km", w1r, x)
    ai = _mm("kc,...cm->...km", w1i, x)
    br, bi = cmul(ar, ai, tr, ti)
    # stage 2 restricted to the band's k2 tiles -> C[k2_sel, k1]
    cr = (_mm("kc,...mc->...km", w2r, br) - _mm("kc,...mc->...km", w2i, bi))
    ci = (_mm("kc,...mc->...km", w2r, bi) + _mm("kc,...mc->...km", w2i, br))
    flat_r = cr.reshape(batch + ((k2_hi - k2_lo) * n1,))
    flat_i = ci.reshape(batch + ((k2_hi - k2_lo) * n1,))
    s = lo - k2_lo * n1
    return jnp.stack([flat_r[..., s : s + hi - lo],
                      flat_i[..., s : s + hi - lo]], axis=-2)


def rfft_ri(x_real):
    """Real-input FFT: (..., N) f32 -> (..., 2, N//2+1) split spectrum.

    Uses the packed two-for-one trick: treat even/odd samples as the
    re/im of a length-N/2 complex FFT, then unpack.
    """
    n = x_real.shape[-1]
    h = n // 2
    ev = x_real[..., 0::2]
    od = x_real[..., 1::2]
    zr, zi = _fft_core(ev, od, h, -1.0)

    # unpack: X[k] = (Z[k]+conj(Z[h-k]))/2 - i/2 * e^{-2πik/n} (Z[k]-conj(Z[h-k]))
    k = np.arange(h + 1)
    wr = np.cos(-2 * np.pi * k / n).astype(np.float32)
    wi = np.sin(-2 * np.pi * k / n).astype(np.float32)

    # Z[k] for k=0..h (Z[h]=Z[0]) and conj(Z[(h-k) % h]) — built from
    # slices + flips, not index gathers (gathers are slow on TPU)
    zkr = jnp.concatenate([zr, zr[..., :1]], axis=-1)
    zki = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zcr = jnp.concatenate(
        [zr[..., :1], jnp.flip(zr[..., 1:], axis=-1), zr[..., :1]], axis=-1)
    zci = -jnp.concatenate(
        [zi[..., :1], jnp.flip(zi[..., 1:], axis=-1), zi[..., :1]], axis=-1)

    er, ei = (zkr + zcr) * 0.5, (zki + zci) * 0.5
    or_, oi = (zkr - zcr) * 0.5, (zki - zci) * 0.5
    # multiply (or_, oi) by -i*w = (wi, -wr)... careful: -i*(wr+iwi) = wi - i*wr
    mr, mi = cmul(or_, oi, wi, -wr)
    return jnp.stack([er + mr, ei + mi], axis=-2)
