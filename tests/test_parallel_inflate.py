"""Speculative parallel inflate spec vs real deflate streams.

Validates the round-2 TPU decode algorithm (decode-at-every-offset +
pointer doubling + parallel LZ resolution) against zlib-produced blocks
and our own encoder's output.
"""

import zlib as pyzlib

import numpy as np
import pytest

import flate_tpu as ft
from flate_tpu import consts
from flate_tpu.inflate import _BitCursor, _decode_dynamic_header, fixed_tables
from flate_tpu.parallel_inflate import decode_block_parallel, resolve_lz


def _decode_stream_parallel(stream: bytes) -> bytes:
    """Decode a full raw deflate stream block-by-block: headers parsed
    serially (tiny), every block body decoded with the parallel passes."""
    bits = _BitCursor(stream, 0)
    out = b""
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        assert btype in (1, 2), f"stored block in test stream ({btype})"
        if btype == 1:
            ll, dd = fixed_tables()
        else:
            ll, dd = _decode_dynamic_header(bits)
        kinds, values, dists, end_bit = decode_block_parallel(
            stream, bits.pos, ll, dd)
        out += resolve_lz(kinds, values, dists, history=out)
        bits.pos = end_bit
        if bfinal:
            return out


@pytest.mark.parametrize("level", [1, 6, 9])
def test_decodes_zlib_streams(rfc_text, level):
    data = rfc_text[:60000]
    co = pyzlib.compressobj(level, pyzlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    assert _decode_stream_parallel(stream) == data


def test_decodes_own_encoder_output(rfc_text):
    data = rfc_text[:40000]
    stream = ft.flate.compress(data, level=6)
    assert _decode_stream_parallel(stream) == data


def test_overlap_heavy_stream():
    """RLE-style data exercises the period-replication copy path."""
    data = b"\x00" * 5000 + b"abc" * 4000 + bytes(range(256)) * 20
    co = pyzlib.compressobj(9, pyzlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    assert _decode_stream_parallel(stream) == data


def test_multi_block_with_history():
    """Back-references across block boundaries use the history argument."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 64, 3000, dtype=np.uint8).tobytes()
    data = base * 40  # repeats force cross-block matches
    co = pyzlib.compressobj(6, pyzlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    assert _decode_stream_parallel(stream) == data
