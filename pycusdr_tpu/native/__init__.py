"""ctypes bindings to the native C++ host runtime (src/sdrnative.cpp).

The library is compiled on first import (g++, cached next to the
source). Every binding has a numpy fallback, so the framework works on
machines without a toolchain — ``AVAILABLE`` says which path is live.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("pycusdr_tpu." + __name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "sdrnative.cpp")
_SO = os.path.join(_HERE, "src", "libsdrnative.so")

AVAILABLE = False
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, AVAILABLE
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
    except Exception as e:
        log.warning("native library unavailable (%s) -- using numpy fallbacks", e)
        return

    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    _lib.rb_create.restype = ctypes.c_void_p
    _lib.rb_create.argtypes = [i64]
    _lib.rb_destroy.argtypes = [ctypes.c_void_p]
    _lib.rb_flush.argtypes = [ctypes.c_void_p]
    _lib.rb_size.restype = i64
    _lib.rb_size.argtypes = [ctypes.c_void_p]
    _lib.rb_insert.restype = i64
    _lib.rb_insert.argtypes = [ctypes.c_void_p, f32p, i64]
    _lib.rb_pop.restype = i64
    _lib.rb_pop.argtypes = [ctypes.c_void_p, f32p, i64]

    _lib.deinterleave_c64.argtypes = [f32p, f32p, f32p, i64]
    _lib.interleave_c64.argtypes = [f32p, f32p, f32p, i64]
    _lib.convolve_bits_i8.argtypes = [i8p, i64, i8p, i64, i32p]
    _lib.pn9_xor.argtypes = [u8p, i64]
    _lib.crc16_8005.restype = ctypes.c_uint16
    _lib.crc16_8005.argtypes = [u8p, i64, ctypes.c_uint16]
    AVAILABLE = True


_load()


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------- public wrappers ----------------


class NativeRingBuffer:
    """complex64 sample ring buffer backed by the C++ implementation.

    Same semantics as runtime.sigfifo.RingBuffer (flush-on-overflow,
    exact-size pops)."""

    def __init__(self, outLen, bufLen=None):
        if not AVAILABLE:
            raise RuntimeError("native library not available")
        if bufLen is None:
            bufLen = 10 * outLen
        elif bufLen < outLen:
            raise IndexError("bufLen < outLen", "buffer too small for output block")
        self.outLen = outLen
        self.bufLen = bufLen
        self._h = _lib.rb_create(bufLen)
        if not self._h:
            raise MemoryError("rb_create failed")

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                _lib.rb_destroy(self._h)
                self._h = None
        except Exception:
            pass

    @property
    def currentBufSize(self):
        return _lib.rb_size(self._h)

    def insert(self, data):
        data = np.ascontiguousarray(data, dtype=np.complex64)
        return _lib.rb_insert(self._h, _fptr(data.view(np.float32)), len(data))

    def popBlock(self, noSamples):
        out = np.empty(noSamples, np.complex64)
        got = _lib.rb_pop(self._h, _fptr(out.view(np.float32)), noSamples)
        if got == 0:
            return []
        return out

    def flush(self):
        _lib.rb_flush(self._h)


def c2ri_native(x: np.ndarray) -> np.ndarray:
    """complex64 (N,) -> float32 (2, N) split, via C++ deinterleave."""
    x = np.ascontiguousarray(x, np.complex64)
    out = np.empty((2, len(x)), np.float32)
    if AVAILABLE:
        _lib.deinterleave_c64(_fptr(x.view(np.float32)), _fptr(out[0]), _fptr(out[1]), len(x))
        return out
    out[0] = x.real
    out[1] = x.imag
    return out


def bit_correlate(bits: np.ndarray, mask_pm1: np.ndarray) -> np.ndarray:
    """Full convolution of {0,1} bits with a ±1 mask (np.convolve parity)."""
    bits = np.ascontiguousarray(bits, np.int8)
    mask = np.ascontiguousarray(mask_pm1, np.int8)
    if not AVAILABLE:
        return np.convolve(bits.astype(np.float64), mask.astype(np.float64))
    out = np.empty(len(bits) + len(mask) - 1, np.int32)
    _lib.convolve_bits_i8(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(bits),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(mask),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def pn9_xor(data: np.ndarray) -> np.ndarray:
    """XOR bytes with the PN9 whitening sequence (in a copy)."""
    out = np.array(data, dtype=np.uint8, copy=True)
    if AVAILABLE:
        _lib.pn9_xor(out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(out))
        return out
    from pycusdr_tpu.utils.shift_registers import pn9

    return out ^ pn9(len(out)).astype(np.uint8)


def crc16(data: np.ndarray, init: int = 0xFFFF) -> int:
    """CRC-16 poly 0x8005 (CC11xx framing)."""
    data = np.ascontiguousarray(data, np.uint8)
    if AVAILABLE:
        return int(_lib.crc16_8005(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data), init
        ))
    from pycusdr_tpu.utils.crc import crc16_cc

    return crc16_cc(bytes(data), init)
