"""Native C++ host-runtime library: build + golden tests vs numpy."""

import numpy as np
import pytest

import pycusdr_tpu.native as native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.AVAILABLE, "native library failed to build (g++ is baked in)"


class TestNativeRingBuffer:
    def test_matches_python_semantics(self):
        from pycusdr_tpu.runtime.sigfifo import RingBuffer

        rng = np.random.RandomState(0)
        nat = native.NativeRingBuffer(100, bufLen=1000)
        ref = RingBuffer(100, bufLen=1000)
        for _ in range(50):
            n = rng.randint(1, 150)
            data = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)
            nat.insert(data)
            ref.insert(data)
            a, b = nat.popBlock(100), ref.popBlock(100)
            assert (len(a) == 0) == (len(b) == 0)
            if len(a):
                np.testing.assert_array_equal(a, b)
        assert nat.currentBufSize == ref.currentBufSize

    def test_wraparound(self):
        rb = native.NativeRingBuffer(64, bufLen=100)
        for start in range(0, 640, 64):
            rb.insert(np.arange(start, start + 64).astype(np.complex64))
            out = rb.popBlock(64)
            np.testing.assert_array_equal(out.real, np.arange(start, start + 64))

    def test_overflow_flush(self):
        rb = native.NativeRingBuffer(10, bufLen=20)
        rb.insert(np.zeros(15, np.complex64))
        rb.insert(np.ones(15, np.complex64))
        assert rb.currentBufSize == 15
        np.testing.assert_array_equal(rb.popBlock(10).real, np.ones(10))

    def test_oversize_chunk_keeps_tail(self):
        rb = native.NativeRingBuffer(10, bufLen=20)
        rb.insert(np.arange(50).astype(np.complex64))
        out = rb.popBlock(10)
        np.testing.assert_array_equal(out.real, np.arange(30, 40))


def test_deinterleave_matches_numpy():
    rng = np.random.RandomState(1)
    x = (rng.randn(4097) + 1j * rng.randn(4097)).astype(np.complex64)
    out = native.c2ri_native(x)
    np.testing.assert_array_equal(out[0], x.real)
    np.testing.assert_array_equal(out[1], x.imag)


def test_bit_correlate_matches_convolve():
    rng = np.random.RandomState(2)
    bits = rng.randint(0, 2, 5000).astype(np.int8)
    mask = (rng.randint(0, 2, 64) * 2 - 1).astype(np.int8)
    got = native.bit_correlate(bits, mask)
    ref = np.convolve(bits.astype(np.float64), mask.astype(np.float64))
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_pn9_matches_python():
    from pycusdr_tpu.utils.shift_registers import pn9

    data = np.arange(64, dtype=np.uint8)
    got = native.pn9_xor(data)
    ref = data ^ pn9(64).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_crc16_matches_python():
    from pycusdr_tpu.utils.crc import crc16_cc

    rng = np.random.RandomState(3)
    for n in [1, 7, 64, 255]:
        data = rng.randint(0, 256, n).astype(np.uint8)
        assert native.crc16(data) == crc16_cc(bytes(data))
