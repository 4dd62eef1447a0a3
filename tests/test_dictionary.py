"""Preset-dictionary support (v1 parity: SURVEY §2.3 V2/V4/V5)."""

import zlib as pyzlib

import pytest

import flate_tpu as ft
from flate_tpu.errors import BadZlibHeader

DICT = b"the quick brown fox jumps over the lazy dog " * 20
DATA = b"the quick brown fox says hello to the lazy dog and jumps away"


def test_raw_dictionary_roundtrip():
    blob = ft.flate.compress(DATA, level=6, dictionary=DICT)
    out = ft.flate.decompress(blob, dictionary=DICT)
    assert out == DATA
    # dictionary must actually help (matches reach into it)
    plain = ft.flate.compress(DATA, level=6)
    assert len(blob) < len(plain)


def test_raw_dictionary_zlib_oracle():
    """zlib's decompressobj with the same dict decodes our stream."""
    blob = ft.flate.compress(DATA, level=6, dictionary=DICT)
    d = pyzlib.decompressobj(-15, zdict=DICT)
    assert d.decompress(blob) == DATA


def test_zlib_fdict_roundtrip():
    blob = ft.zlib.compress(DATA, level=6, dictionary=DICT)
    # header has FDICT + DICTID
    assert blob[1] & 0x20
    out = ft.zlib.decompress(blob, dictionary=DICT)
    assert out == DATA
    # CPython zlib oracle
    d = pyzlib.decompressobj(zdict=DICT)
    assert d.decompress(blob) == DATA


def test_zlib_fdict_requires_dictionary():
    blob = ft.zlib.compress(DATA, level=6, dictionary=DICT)
    with pytest.raises(BadZlibHeader):
        ft.zlib.decompress(blob)


def test_decode_zlib_produced_dict_stream():
    c = pyzlib.compressobj(6, pyzlib.DEFLATED, 15, zdict=DICT)
    blob = c.compress(DATA) + c.flush()
    assert ft.zlib.decompress(blob, dictionary=DICT) == DATA


def test_streaming_compressor_with_dictionary():
    import io
    out = io.BytesIO()
    c = ft.flate.compressor(out, level=6, dictionary=DICT)
    c.write(DATA)
    c.finish()
    assert ft.flate.decompress(out.getvalue(), dictionary=DICT) == DATA
