"""End-to-end matrix: data x level x container x (one-shot | streaming),
differential against CPython zlib (madler/zlib) as the independent oracle.

Mirrors the reference's "flate compress/decompress" matrix
(src/flate.zig:87-244).
"""

import gzip as pygzip
import io
import zlib as pyzlib

import numpy as np
import pytest

import flate_tpu as ft
from flate_tpu.containers import Container

RNG = np.random.default_rng(42)


def _cases(rfc_text):
    return {
        "empty": b"",
        "byte": b"x",
        "abc": b"abcdefghijklmnopqrstuvwxyz" * 4,
        "runs": b"aaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbbbbbcccccccc" * 100,
        "rand4k": bytes(RNG.integers(0, 256, 4096, dtype=np.uint8)),
        "text": rfc_text,
        "multi_shard": rfc_text * 5,   # > SHARD_LEN: exercises sharding
    }


def _oracle_decode(container: Container, blob: bytes) -> bytes:
    if container is Container.GZIP:
        return pygzip.decompress(blob)
    if container is Container.ZLIB:
        return pyzlib.decompress(blob)
    return pyzlib.decompressobj(-15).decompress(blob)


NAMESPACES = {
    Container.RAW: ft.flate,
    Container.GZIP: ft.gzip,
    Container.ZLIB: ft.zlib,
}


@pytest.mark.parametrize("level", [1, 4, 6, 9])
@pytest.mark.parametrize("container", list(NAMESPACES))
def test_oneshot_roundtrip(rfc_text, level, container):
    ns = NAMESPACES[container]
    for name, data in _cases(rfc_text).items():
        blob = ns.compress(data, level=level)
        assert ns.decompress(blob) == data, f"self-decode {name}"
        assert _oracle_decode(container, blob) == data, f"oracle {name}"


@pytest.mark.parametrize("container", list(NAMESPACES))
def test_huffman_and_store_modes(rfc_text, container):
    ns = NAMESPACES[container]
    for name, data in _cases(rfc_text).items():
        for sub in (ns.huffman, ns.store):
            blob = sub.compress(data)
            assert sub.decompress(blob) == data, f"{name}"
            assert _oracle_decode(container, blob) == data, f"{name}"


def test_streaming_writer(rfc_text):
    """Chunked write()/flush()/finish() equals the one-shot output bytes
    being a valid stream; every flush produces a decodable prefix."""
    out = io.BytesIO()
    c = ft.gzip.compressor(out, level=6)
    step = 50_000
    for i in range(0, len(rfc_text) * 5, step):
        c.write((rfc_text * 5)[i:i + step])
    c.flush()
    mid = len(out.getvalue())
    assert mid > 0
    c.write(b"tail-data" * 100)
    c.finish()
    blob = out.getvalue()
    assert pygzip.decompress(blob) == rfc_text * 5 + b"tail-data" * 100
    assert ft.gzip.decompress(blob) == rfc_text * 5 + b"tail-data" * 100


def test_streaming_reader(rfc_text):
    blob = ft.zlib.compress(rfc_text, level=6)
    d = ft.zlib.decompressor(io.BytesIO(blob))
    chunks = []
    while True:
        ch = d.read(1000)
        if not ch:
            break
        chunks.append(ch)
    assert b"".join(chunks) == rfc_text


def test_compressor_reset_multi_member(rfc_text):
    """reset() starts a new gzip member on the same writer; both decode."""
    out = io.BytesIO()
    c = ft.gzip.compressor(out, level=4)
    c.write(b"first stream")
    c.finish()
    c.reset()
    c.write(b"second stream")
    c.finish()
    blob = out.getvalue()
    assert pygzip.decompress(blob) == b"first streamsecond stream"
    assert ft.gzip.decompress(blob) == b"first streamsecond stream"


def test_flush_prefix_decodable():
    """After flush(), the bytes so far form a decodable deflate prefix
    (network-protocol flush semantics, deflate.zig:325-337)."""
    out = io.BytesIO()
    c = ft.flate.compressor(out, level=6)
    c.write(b"hello flush semantics " * 100)
    c.flush()
    prefix = out.getvalue()
    d = pyzlib.decompressobj(-15)
    got = d.decompress(prefix)
    assert got == b"hello flush semantics " * 100


def test_set_writer(rfc_text):
    out1, out2 = io.BytesIO(), io.BytesIO()
    c = ft.flate.compressor(out1, level=4)
    c.write(b"part one ")
    c.flush()
    c.set_writer(out2)
    c.write(b"part two")
    c.finish()
    blob = out1.getvalue() + out2.getvalue()
    assert pyzlib.decompressobj(-15).decompress(blob) == b"part one part two"


def test_compressed_output_deterministic(rfc_text):
    a = ft.gzip.compress(rfc_text, level=6)
    b = ft.gzip.compress(rfc_text, level=6)
    assert a == b


def test_zlib_oracle_streams_decode(rfc_text):
    """Our inflate decodes zlib-produced streams at every level."""
    for level in range(0, 10):
        blob = pyzlib.compress(rfc_text, level)
        assert ft.zlib.decompress(blob) == rfc_text
    # and gzip-produced
    blob = pygzip.compress(rfc_text)
    assert ft.gzip.decompress(blob) == rfc_text


def test_small_alphabet_roundtrip_own_decoder():
    """Regression: codegen RLE must not let a repeat code span the hlit
    boundary (our decoder and the reference reject such headers; zlib
    accepts them, which masked the bug in interop-only tests)."""
    import numpy as np
    rng = np.random.default_rng(7)
    cases = [
        bytes(rng.integers(0, 2, 50_000, dtype=np.uint8)),   # 2-symbol
        bytes(rng.integers(97, 100, 30_000, dtype=np.uint8)),  # 3-symbol
        bytes([5]) * 20_000,                                   # 1-symbol
        bytes(rng.integers(0, 5, 10_000, dtype=np.uint8) * 50),
    ]
    for data in cases:
        for level in (1, 4, 6, 9):
            blob = ft.flate.compress(data, level=level)
            assert ft.flate.decompress(blob) == data
            assert pyzlib.decompressobj(-15).decompress(blob) == data
