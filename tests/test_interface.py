"""Public-interface conformance: the three container namespaces expose the
identical working surface (mirrors "flate public interface",
src/flate.zig:356-481)."""

import io

import pytest

import flate_tpu as ft

NAMESPACES = [ft.flate, ft.gzip, ft.zlib]
SURFACE = ["compress", "decompress", "compressor", "decompressor",
           "Compressor", "Decompressor", "huffman", "store"]
SUB_SURFACE = ["compress", "decompress", "compressor", "decompressor"]


@pytest.mark.parametrize("ns", NAMESPACES,
                         ids=["flate", "gzip", "zlib"])
def test_surface_complete(ns):
    for name in SURFACE:
        assert hasattr(ns, name), name
    for sub in (ns.huffman, ns.store):
        for name in SUB_SURFACE:
            assert hasattr(sub, name), name


@pytest.mark.parametrize("ns", NAMESPACES,
                         ids=["flate", "gzip", "zlib"])
def test_every_entry_point_works(ns):
    data = b"interface conformance payload " * 20

    assert ns.decompress(ns.compress(data)) == data

    out = io.BytesIO()
    c = ns.compressor(out, level=5)
    c.write(data)
    c.finish()
    d = ns.decompressor(io.BytesIO(out.getvalue()))
    assert d.read_all() == data

    assert ns.huffman.decompress(ns.huffman.compress(data)) == data
    assert ns.store.decompress(ns.store.compress(data)) == data

    out = io.BytesIO()
    hc = ns.huffman.compressor(out)
    hc.write(data)
    hc.finish()
    assert ns.decompress(out.getvalue()) == data

    out = io.BytesIO()
    sc = ns.store.compressor(out)
    sc.write(data)
    sc.finish()
    assert ns.decompress(out.getvalue()) == data


def test_level_aliases():
    from flate_tpu import consts
    assert consts.LEVEL_FAST == 4
    assert consts.LEVEL_DEFAULT == 6
    assert consts.LEVEL_BEST == 9
    data = b"alias levels " * 50
    for lv in (consts.LEVEL_FAST, consts.LEVEL_DEFAULT, consts.LEVEL_BEST):
        assert ft.flate.decompress(ft.flate.compress(data, level=lv)) == data
