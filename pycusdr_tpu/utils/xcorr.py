"""FFT cross-correlation helpers.

Capability parity with ``pyCuSDR/lib/customXCorr.py:5-30`` — used by the
softCombiner to align multi-channel bit streams. A jax variant is
provided for on-device alignment when channels are mesh-sharded.
"""

import numpy as np


def custom_xcorr(a, b, N=None):
    """Circular cross-correlation via FFT: ifft(fft(a) * conj(fft(b))).

    The peak index locates where ``b`` starts inside ``a``.
    """
    Na, Nb = len(a), len(b)
    if N is None:
        N = max(Na, Nb)
    A = np.fft.fft(a, N)
    B = np.fft.fft(b, N)
    return np.fft.ifft(A * np.conj(B), N)


def custom_xcorr_fast(a, b):
    """Zero-pad to the next power of two before correlating."""
    N = int(2 ** np.ceil(np.log2(max(len(a), len(b)))))
    return custom_xcorr(a, b, N)


def custom_xcorr_jax(a, b, N: int):
    """jax.numpy version (static FFT length ``N``) for jitted alignment."""
    import jax.numpy as jnp

    A = jnp.fft.fft(a, N)
    B = jnp.fft.fft(b, N)
    return jnp.fft.ifft(A * jnp.conj(B), N)
