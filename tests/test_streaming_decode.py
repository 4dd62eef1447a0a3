"""Bounded-memory streaming decode (native InflateStream + Decompressor).

Reference semantics being matched: pull-based 64K-granular decode
(inflate.zig:315-336), mid-protocol reader swap (inflate.zig:283),
concatenated-member reset (inflate.zig:301-309).
"""
import zlib

import numpy as np
import pytest

import flate_tpu as ft
from flate_tpu import native
from flate_tpu.api import Decompressor
from flate_tpu.containers import Container

pytestmark = pytest.mark.skipif(not native.inflate_available(),
                                reason="native decoder unavailable")


def _mixed_data(n: int) -> bytes:
    rng = np.random.default_rng(3)
    text = (b"the streaming decoder must bound its memory " * 400)
    rnd = rng.integers(0, 256, n // 3, dtype=np.uint8).tobytes()
    return ((text + rnd) * (n // (len(text) + len(rnd)) + 1))[:n]


def test_chunked_reads_match_oneshot():
    data = _mixed_data(4 << 20)
    blob = zlib.compress(data, 6)
    d = Decompressor(blob, Container.ZLIB)
    got = bytearray()
    while True:
        c = d.read(50_000)
        if not c:
            break
        got += c
    assert bytes(got) == data
    assert d.at_end()


def test_stream_state_is_bounded():
    # the native state is O(64K): Tables + 64K ring, independent of output
    st = native.InflateStream(zlib.compress(b"x" * (8 << 20), 9)[2:-4])
    size = st._lib.inflate_stream_state_size()
    assert size < 512 * 1024
    total = 0
    while True:
        c = st.read(65536)
        if not c:
            break
        total += len(c)
    assert total == 8 << 20


def test_mid_member_set_reader():
    data = _mixed_data(1 << 20)
    blob = zlib.compress(data, 6)
    cut = len(blob) // 2
    d = Decompressor(blob[:cut], Container.ZLIB, verify=True)
    first = d.read(100_000)
    assert first == data[:100_000]
    d.set_reader(blob[cut:])
    rest = d.read(-1)
    assert first + rest == data


def test_concatenated_members_reset():
    a, b = b"first member " * 1000, b"second member " * 1000
    blob = zlib.compress(a, 6) + zlib.compress(b, 9)
    d = Decompressor(blob, Container.ZLIB)
    assert d.read(-1) == a
    assert not d.at_end()
    d.reset()
    assert d.read(-1) == b
    assert d.at_end()


def test_wrong_checksum_detected_at_member_end():
    data = _mixed_data(200_000)
    blob = bytearray(zlib.compress(data, 6))
    blob[-2] ^= 0xFF                      # corrupt the adler footer
    d = Decompressor(bytes(blob), Container.ZLIB)
    got = bytearray()
    with pytest.raises(ft.errors.WrongZlibChecksum):
        while True:
            c = d.read(30_000)
            if not c:
                break
            got += c
    # all payload bytes were served before the footer check fired
    assert bytes(got) == data


def test_stream_decode_of_gzip_members():
    data = _mixed_data(1 << 20)
    blob = ft.gzip.compress(data, level=6)
    d = Decompressor(blob, Container.GZIP)
    got = bytearray()
    while True:
        c = d.read(77_777)
        if not c:
            break
        got += c
    assert bytes(got) == data
