"""NRZ-S line coding (phase-ambiguity-free BPSK).

Capability parity with ``examples/benchmark/create_signals.py:29-42`` and
``protocol/benchmark/bench_BPSK.py:16-28`` in the reference.
NRZ-S: a 1 keeps the previous level, a 0 toggles it.
"""

import numpy as np


def encode_nrzs(bits) -> np.ndarray:
    bits = np.asarray(bits).astype(np.uint8)
    out = np.zeros(len(bits), dtype=np.uint8)
    out[0] = bits[0]
    for i in range(1, len(bits)):
        out[i] = out[i - 1] if bits[i] == 1 else (~out[i - 1]) & 1
    return out


def decode_nrzs(levels) -> np.ndarray:
    levels = np.asarray(levels).astype(np.uint8)
    out = np.zeros(len(levels), dtype=np.uint8)
    out[0] = levels[0]
    out[1:] = (levels[1:] == levels[:-1]).astype(np.uint8)
    return out
