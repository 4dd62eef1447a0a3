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


def test_huffman_only_beats_store(rfc_text):
    h = len(ft.flate.huffman.compress(rfc_text))
    s = len(ft.flate.store.compress(rfc_text))
    assert h < s
    assert s >= len(rfc_text)  # store adds framing only
    assert s <= len(rfc_text) + 5 * (len(rfc_text) // 65535 + 1) + 16
