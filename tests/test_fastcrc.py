"""Native CLMUL CRC32 / blocked Adler32 vs the zlib oracle.

The host verify path (containers.Hasher -> checksums.crc32/adler32)
routes large buffers through native/fastcrc.c; these sweeps pin its
equivalence with CPython's zlib (madler/zlib) across the block-size
boundaries of both implementations (reference checksum semantics:
container.zig:168-206)."""

import zlib

import numpy as np
import pytest

from flate_tpu import checksums, native

pytestmark = pytest.mark.skipif(
    native.crc32(b"x") is None, reason="native fastcrc unavailable")

LENS = [0, 1, 7, 15, 16, 17, 63, 64, 65, 127, 128, 129, 255, 1000,
        4095, 4096, 4097, 5551, 5552, 65535, 65536, 1 << 20]


@pytest.mark.parametrize("n", LENS)
def test_crc32_matches_zlib(n):
    rng = np.random.default_rng(n + 1)
    d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    for v0 in (0, 0xDEADBEEF, 123456789):
        assert native.crc32(d, v0) == zlib.crc32(d, v0) & 0xFFFFFFFF


@pytest.mark.parametrize("n", LENS)
def test_adler32_matches_zlib(n):
    rng = np.random.default_rng(n + 2)
    d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    for v0 in (1, 0x12345678):
        assert native.adler32(d, v0) == zlib.adler32(d, v0) & 0xFFFFFFFF


def test_crc32_unaligned_starts():
    rng = np.random.default_rng(9)
    big = rng.integers(0, 256, 1 << 18, dtype=np.uint8).tobytes()
    for off in (1, 2, 3, 5, 13, 15):
        assert native.crc32(big[off:]) == zlib.crc32(big[off:]) & 0xFFFFFFFF


def test_checksums_route_through_native():
    rng = np.random.default_rng(10)
    d = rng.integers(0, 256, 1 << 17, dtype=np.uint8).tobytes()
    assert checksums.crc32(d) == zlib.crc32(d) & 0xFFFFFFFF
    assert checksums.adler32(d) == zlib.adler32(d) & 0xFFFFFFFF
    # running-value chaining across chunks
    c = 0
    a = 1
    for i in range(0, len(d), 77777):
        c = checksums.crc32(d[i:i + 77777], c)
        a = checksums.adler32(d[i:i + 77777], a)
    assert c == zlib.crc32(d) & 0xFFFFFFFF
    assert a == zlib.adler32(d) & 0xFFFFFFFF
