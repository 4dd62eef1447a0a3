"""Checksum kernels vs the zlib oracle (CRC32/Adler32 + combine algebra)."""

import zlib

import numpy as np
import pytest

from flate_tpu import checksums


RNG = np.random.default_rng(0)
CASES = [
    b"",
    b"a",
    b"hello world",
    bytes(RNG.integers(0, 256, size=1000, dtype=np.uint8)),
    bytes(RNG.integers(0, 256, size=65537, dtype=np.uint8)),
    b"\x00" * 100000,
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_crc32_np_matches_zlib(i):
    data = CASES[i]
    arr = np.frombuffer(data, dtype=np.uint8)
    assert checksums.crc32_np(arr) == zlib.crc32(data) & 0xFFFFFFFF


@pytest.mark.parametrize("i", range(len(CASES)))
def test_adler32_np_matches_zlib(i):
    data = CASES[i]
    arr = np.frombuffer(data, dtype=np.uint8)
    assert checksums.adler32_np(arr) == zlib.adler32(data) & 0xFFFFFFFF


def test_crc32_combine():
    a = b"The quick brown fox "
    b = bytes(RNG.integers(0, 256, size=12345, dtype=np.uint8))
    combined = checksums.crc32_combine(
        zlib.crc32(a), zlib.crc32(b), len(b))
    assert combined == zlib.crc32(a + b) & 0xFFFFFFFF


def test_adler32_combine():
    a = b"jumps over the lazy dog"
    b = bytes(RNG.integers(0, 256, size=54321, dtype=np.uint8))
    combined = checksums.adler32_combine(
        zlib.adler32(a), zlib.adler32(b), len(b))
    assert combined == zlib.adler32(a + b) & 0xFFFFFFFF


def test_crc32_combine_chain():
    """Sharded CRC: combine over many pieces == whole (multi-chip path)."""
    data = bytes(RNG.integers(0, 256, size=100000, dtype=np.uint8))
    parts = [data[i:i + 7919] for i in range(0, len(data), 7919)]
    crc = 0
    for p in parts:
        crc = checksums.crc32_combine(crc, zlib.crc32(p), len(p))
    assert crc == zlib.crc32(data) & 0xFFFFFFFF


def test_adler32_with_init_value():
    data = CASES[4]
    arr = np.frombuffer(data, dtype=np.uint8)
    init = zlib.adler32(b"prefix!")
    assert checksums.adler32_np(arr, init) == zlib.adler32(data, init) & 0xFFFFFFFF
