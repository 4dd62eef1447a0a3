"""Device CRC32/Adler32 kernels vs the zlib oracle."""
import zlib

import numpy as np
import pytest

from flate_tpu.jx import checksum as ck


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_crc32_full_rows(rng):
    rows = rng.integers(0, 256, (4, 8192), dtype=np.uint8)
    got = ck.crc32_shards(rows, np.full(4, 8192))
    want = [zlib.crc32(r.tobytes()) & 0xFFFFFFFF for r in rows]
    assert got.tolist() == want


def test_crc32_ragged_rows(rng):
    S = 8192
    rows = rng.integers(0, 256, (4, S), dtype=np.uint8)
    lens = np.asarray([S, S - 1, 1000, 1])
    for b in range(4):
        rows[b, lens[b]:] = 0
    got = ck.crc32_shards(rows, lens)
    want = [zlib.crc32(rows[b, :lens[b]].tobytes()) & 0xFFFFFFFF
            for b in range(4)]
    assert got.tolist() == want


@pytest.mark.parametrize("n", [0, 1, 1023, 1024, 1025, 99999])
def test_crc32_device_whole_buffer(rng, n):
    d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ck.crc32_device(d) == (zlib.crc32(d) & 0xFFFFFFFF)


@pytest.mark.parametrize("n", [0, 1, 2047, 2048, 2049, 77777])
def test_adler32_device_whole_buffer(rng, n):
    d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert ck.adler32_device(d) == (zlib.adler32(d) & 0xFFFFFFFF)


def test_adler32_ragged_rows(rng):
    S = 8192
    rows = rng.integers(0, 256, (4, S), dtype=np.uint8)
    lens = np.asarray([S, S - 3, 10, 0])
    for b in range(4):
        rows[b, lens[b]:] = 0
    got = ck.adler32_shards(rows, lens)
    want = [zlib.adler32(rows[b, :lens[b]].tobytes()) & 0xFFFFFFFF
            for b in range(4)]
    assert got.tolist() == want


def test_crc32_text_vs_binary():
    text = (b"the quick brown fox " * 4000)[:65536]
    assert ck.crc32_device(text) == (zlib.crc32(text) & 0xFFFFFFFF)
    assert ck.adler32_device(text) == (zlib.adler32(text) & 0xFFFFFFFF)
