"""The jitted per-block demodulation graph.

Composes the ops in ``pycusdr_tpu.ops`` into ONE XLA computation per
block: clip → FFT → Doppler search (MXU matmul) → best-shift matched
filter → symbol timing → symbol detection → bits + trust. The reference
needs 6 kernel launches, 3 cuFFT plans and 4 device→host syncs per
block (SURVEY §3.2); here there is exactly one device→host transfer of
the small result bundle.

Golden-tested against ``dsp.reference.demod_block_numpy``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pycusdr_tpu.dsp.spec import DemodSpec
from pycusdr_tpu.ops.demod_kernels import (
    apply_best_doppler,
    compute_snr,
    dilate_mask_dynamic,
    extract_bits_lut,
    extract_bits_nrzs,
    find_centres,
    find_code_rate_and_phase,
    threshold_input,
)
from pycusdr_tpu.ops.doppler_search import (
    doppler_energy_matmul,
    find_doppler_estimate,
    make_shift_gather_indices,
)

TRUST_NORMAL = 2
TRUST_SYMBOL_ERROR = -1
TRUST_CLIPPED = -2


def build_process_block(spec: DemodSpec, jit: bool = True, donate: bool = False):
    """Return ``process_block(samples) -> dict`` jitted for ``spec``.

    All spec-derived constants are closed over (device-resident); the
    only runtime input is the complex64 sample block.
    """
    N = spec.Nfft
    masks_f = jnp.asarray(spec.masks_f)  # (M, N) complex64
    Q_T = jnp.asarray(
        (np.abs(spec.masks_f.astype(np.complex64)) ** 2).T.astype(np.float32)
    )  # (N, M)
    shift_idx = jnp.asarray(make_shift_gather_indices(N, spec.dopp_shifts))
    dopp_shifts = jnp.asarray(spec.dopp_shifts.astype(np.int32))
    hz_lut = jnp.asarray(spec.dopp_hz_lut.astype(np.float32))
    D = spec.D

    bitLUT = None if spec.bitLUT is None else jnp.asarray(spec.bitLUT.astype(np.int8))
    symLUT = None if spec.symbolLUT is None else jnp.asarray(spec.symbolLUT.astype(np.int32))
    trust_normal = np.int8(TRUST_NORMAL * spec.voteWeight)

    def process_block(samples: jnp.ndarray) -> dict:
        sig = samples.astype(jnp.complex64)

        if spec.disable_peak_thresholding:
            clipped = jnp.zeros((N,), dtype=bool)
        else:
            sig, clipped = threshold_input(sig, spec.peak_threshold_scale)

        S = jnp.fft.fft(sig)
        absS = jnp.abs(S)

        if spec.doppler_search:
            P = (S.real**2 + S.imag**2).astype(jnp.float32)
            E = doppler_energy_matmul(P, Q_T, shift_idx)
            dopp_idx, quality_db = find_doppler_estimate(
                E, spec.num_dopplers, spec.dopp_array_offset, spec.sum_all_masks
            )
            # fractional-bin interpolation (reference demodulator_base.py:609-618)
            lowIdx = jnp.clip(jnp.floor(dopp_idx).astype(jnp.int32), 0, D - 1)
            highIdx = jnp.clip(jnp.ceil(dopp_idx).astype(jnp.int32), 0, D - 1)
            frac = jnp.mod(dopp_idx, 1.0)
            doppler_hz = hz_lut[lowIdx] + (hz_lut[highIdx] - hz_lut[lowIdx]) * frac
            sl = dopp_shifts[lowIdx].astype(jnp.float32)
            sh = dopp_shifts[highIdx].astype(jnp.float32)
            shift = jnp.round(sl + (sh - sl) * frac).astype(jnp.int32)
            snr_db = compute_snr(
                absS, dopp_shifts[lowIdx], dopp_shifts[highIdx], spec.snr_window, N
            )
            freq_offset_hz = doppler_hz - spec.centreFreqOffset
        else:
            E = jnp.zeros((D, spec.num_masks), dtype=jnp.float32)
            dopp_idx = jnp.float32(0.0)
            quality_db = jnp.float32(0.0)
            doppler_hz = jnp.float32(0.0)
            freq_offset_hz = jnp.float32(0.0)
            snr_db = jnp.float32(0.0)
            shift = jnp.int32(spec.dopp_offset_idx)

        X = apply_best_doppler(S, masks_f, shift)
        P2 = (X.real**2 + X.imag**2).astype(jnp.float32)  # (M, N)

        spSym, codeOffset, code_val = find_code_rate_and_phase(
            P2, spec.code_idx_lo, spec.code_idx_hi, N, spec.code_search_mask_offset
        )

        symbols, centres, mags, nSym, spc = find_centres(
            P2,
            spSym,
            codeOffset,
            Nfft=N,
            windowWidth=spec.windowWidth,
            spsymMin=spec.spsymMin,
            numSymMax=spec.numSymMax,
        )

        trust = jnp.full((spec.numSymMax,), trust_normal, dtype=jnp.int8)
        if bitLUT is not None:
            bits = extract_bits_lut(symbols, bitLUT)
            nBits = nSym
        else:
            bits, err = extract_bits_nrzs(symbols, symLUT)
            trust = jnp.where(err, jnp.int8(TRUST_SYMBOL_ERROR), trust)
            nBits = nSym - 1

        # tag bits near clipped interference with trust -2
        # (reference demodulator_base.py:818-837)
        if not spec.disable_peak_thresholding:
            hw = 2 * jnp.ceil(spc).astype(jnp.int32)
            dil = dilate_mask_dynamic(clipped, hw)
            at_centres = jnp.take(dil, jnp.clip(centres, 0, N - 1))
            trust = jnp.where(at_centres, jnp.int8(TRUST_CLIPPED), trust)

        return {
            "bits": bits,
            "trust": trust,
            "symbols": symbols,
            "centres": centres,
            "mags": mags,
            "nSym": nSym,
            "nBits": nBits,
            "spSym": spSym,
            "codeOffset": codeOffset,
            "code_val": code_val,
            "dopp_idx": dopp_idx,
            "quality_db": quality_db,
            "doppler_hz": doppler_hz,
            "freq_offset_hz": freq_offset_hz,
            "snr_db": snr_db,
            "shift": shift,
            "clipped_any": jnp.any(clipped),
            "E": E,
        }

    if jit:
        kwargs = {"donate_argnums": (0,)} if donate else {}
        return jax.jit(process_block, **kwargs)
    return process_block
