"""Device decode of ARBITRARY (unindexed) streams — jx.anyinflate.

The north-star input is a plain zlib-produced gzip with no FLT1 index
(reference decodes any conformant stream: inflate.zig:220-280).  These
run the full chunk-speculative pipeline in interpret mode on CPU.
"""
import struct
import zlib

import numpy as np
import pytest

from flate_tpu.jx import anyinflate as ai


def _gz(d: bytes, level: int) -> bytes:
    return (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
            + zlib.compress(d, level)[2:-4]
            + struct.pack("<II", zlib.crc32(d), len(d) & 0xFFFFFFFF))


def _text(n):
    with open("tests/data/rfc1951.txt", "rb") as fh:
        t = fh.read()
    return (t * (n // len(t) + 1))[:n]


@pytest.mark.parametrize("level", [1, 6, 9])
def test_any_decode_zlib_stream(level):
    data = _text(200000)
    out = ai.decompress_device_any(_gz(data, level), chunk_bytes=32768,
                                   interpret=True)
    assert out == data


def test_any_decode_stored_blocks():
    data = _text(100000)
    out = ai.decompress_device_any(_gz(data, 0), chunk_bytes=32768,
                                   interpret=True)
    assert out == data


def test_any_decode_incompressible():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    out = ai.decompress_device_any(_gz(data, 6), chunk_bytes=32768,
                                   interpret=True)
    assert out == data


def test_any_decode_tiny_fixed_block():
    data = b"hello hello hello"
    out = ai.decompress_device_any(_gz(data, 6), interpret=True)
    assert out == data


def test_any_decode_mixed_stored_coded():
    rng = np.random.default_rng(7)
    data = (_text(30000)
            + rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()) * 3
    out = ai.decompress_device_any(_gz(data, 6), chunk_bytes=32768,
                                   interpret=True)
    assert out == data


def test_any_decode_long_runs():
    data = b"a" * 150000 + _text(20000)
    out = ai.decompress_device_any(_gz(data, 6), chunk_bytes=32768,
                                   interpret=True)
    assert out == data


def test_any_decode_multi_member():
    d1, d2 = _text(50000), b"x" * 30000
    out = ai.decompress_device_any(_gz(d1, 6) + _gz(d2, 6),
                                   chunk_bytes=32768, interpret=True)
    assert out == d1 + d2


def test_any_decode_detects_corruption():
    g = bytearray(_gz(_text(200000), 6))
    g[len(g) // 2] ^= 0x10
    with pytest.raises(Exception):
        ai.decompress_device_any(bytes(g), chunk_bytes=32768,
                                 interpret=True)


def test_scan_headers_finds_true_headers():
    from flate_tpu import native
    if not native.inflate_available():
        pytest.skip("native library unavailable")
    raw = zlib.compress(_text(400000), 6)[2:-4]
    found = native.scan_headers(raw, 0, None, max_out=1000)
    # the stream's first block header is at bit 0
    assert found and found[0] == 0
