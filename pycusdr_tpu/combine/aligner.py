"""Cross-correlation alignment of delayed bit streams.

The combiner receives the same transmission from channels with unknown
relative delays (different ground stations, network paths). Alignment
is a circular FFT cross-correlation of the bit streams with a
peak-significance test: accept the best lag only if its correlation
beats ``mean + varianceMultiplier * std`` of the 3rd..15th best peaks
(reference ``softCombiner.py:697-726``).
"""

import numpy as np

from pycusdr_tpu.utils.xcorr import custom_xcorr

N_PEAKS = 15


def xcorr_peak(bitsT: np.ndarray, bitsM: np.ndarray, varianceMultiplier: float):
    """Find where ``bitsM`` starts inside ``bitsT``.

    Returns (lag, accepted): ``lag`` is the argmax of
    |xcorr(pad2(bitsT), bitsM[:len(bitsT)])|; ``accepted`` is the
    significance verdict.
    """
    n = len(bitsT)
    if n == 0 or len(bitsM) == 0:
        return 0, False
    nAdd = int(2 ** np.ceil(np.log2(max(n, 2))))
    bitsX = np.r_[np.asarray(bitsT, float), np.zeros(nAdd - n)]
    xc = np.abs(custom_xcorr(bitsX, np.asarray(bitsM[:n], float)))

    k = min(N_PEAKS, len(xc))
    # top-k peak values, descending (the reference zeroes the argmax
    # k times; a partial sort is equivalent and O(n))
    top = np.sort(np.partition(xc, -k)[-k:])[::-1]
    lag = int(np.argmax(xc))
    if k <= 3:
        return lag, False
    cond = np.mean(top[2:]) + varianceMultiplier * np.std(top[2:])
    return lag, bool(top[0] > cond)
