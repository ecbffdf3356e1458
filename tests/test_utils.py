"""Unit tests for utils: CRC, PN9, filters, xcorr, NRZ-S, config loader."""

import numpy as np
import pytest

from pycusdr_tpu.config import load_modular_json, merge_configs, strip_json_comments
from pycusdr_tpu.utils import (
    crc16_cc,
    custom_xcorr,
    decode_nrzs,
    encode_nrzs,
    gaussian_filter,
    pn9,
    rrcosfilter,
    ssrg,
)
from pycusdr_tpu.utils.crc import crc16_bytes_le


def crc16_bitwise(data, poly=0x8005, init=0xFFFF):
    """Independent bit-by-bit CRC for cross-validation."""
    crc = init
    for byte in bytearray(data):
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def test_crc16_known_vector():
    # CRC-16/CMS: poly 0x8005, init 0xFFFF, no reflect, no xorout
    assert crc16_cc(b"123456789") == 0xAEE7


def test_crc16_vs_bitwise():
    rng = np.random.RandomState(1)
    for n in [1, 2, 7, 64, 300]:
        data = rng.randint(0, 256, n).astype(np.uint8)
        assert crc16_cc(data) == crc16_bitwise(data.tobytes())


def test_crc16_packing():
    crc = crc16_cc(b"\x05hello")
    packed = crc16_bytes_le(b"\x05hello")
    assert packed[0] == crc & 0xFF and packed[1] == crc >> 8


def test_pn9_datasheet_sequence():
    # TI CC11xx PN9 whitening sequence (design note DN509 / SWRA322)
    seq = pn9(16)
    expected = [0xFF, 0xE1, 0x1D, 0x9A, 0xED, 0x85, 0x33, 0x24, 0xEA, 0x7A, 0xD2, 0x39, 0x70, 0x97, 0x57, 0x0A]
    assert list(seq[:16]) == expected


def test_pn9_period():
    seq = pn9(600)
    # PN9 period is 511 bits; over bytes the pattern repeats every 511 bytes
    assert list(seq[:50]) == list(seq[511 : 511 + 50])


def test_ssrg_msequence():
    seq = ssrg(4, [1, 4])
    assert len(seq) == 15
    assert set(seq) == {0, 1}
    # m-sequence balance: 2^(L-1) ones
    assert np.sum(seq) == 8


def test_rrcos_energy_and_symmetry():
    b = rrcosfilter(0.5, 6, 8)
    assert np.isclose(np.sum(b**2), 1.0)
    assert np.allclose(b, b[::-1])


def test_gaussian_filter_norm():
    ft = gaussian_filter(1, 0.5, 8, 32)
    assert np.isclose(np.sum(ft), 1.0)
    assert np.all(ft > 0)


def test_xcorr_finds_offset():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2, 4096).astype(float)
    b = a[1000:1500]
    res = np.abs(custom_xcorr(a, b, 4096))
    assert np.argmax(res) == 1000


def test_nrzs_roundtrip():
    rng = np.random.RandomState(4)
    bits = rng.randint(0, 2, 256)
    assert np.array_equal(decode_nrzs(encode_nrzs(bits)), bits)


def test_strip_comments():
    txt = '{"a": 1, // line\n "b": "http://x", /* block */ "c": 2}'
    import json

    assert json.loads(strip_json_comments(txt)) == {"a": 1, "b": "http://x", "c": 2}


def test_merge_configs_deep():
    base = {"A": {"x": 1, "y": 2}, "B": 3}
    over = {"A": {"y": 5}, "C": 7}
    m = merge_configs(base, over)
    assert m == {"A": {"x": 1, "y": 5}, "B": 3, "C": 7}


def test_load_modular_json(tmp_path):
    (tmp_path / "base.json").write_text('{"Main": {"a": 1, "b": 2}} // base')
    (tmp_path / "child.json").write_text('{"configBase": "base.json", "Main": {"b": 9}}')
    cfg = load_modular_json(str(tmp_path / "child.json"))
    assert cfg == {"Main": {"a": 1, "b": 9}}
