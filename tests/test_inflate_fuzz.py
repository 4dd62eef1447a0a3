"""Malformed-stream corpus: exact error classes and outputs.

Mirrors the reference's fuzz-regression table (inflate.zig:481-542) and the
concatenated-stream reset test "flate bug 18967" (inflate.zig:544-563).
"""

import pytest

from flate_tpu import errors, flate
from flate_tpu.containers import Container
from flate_tpu.inflate import decompress as inflate_decompress
from flate_tpu.inflate import decompress_multi

# (input name, expected output file or literal, expected error class)
CASES = [
    ("deflate-stream", "deflate-stream.expect", None),
    ("empty-distance-alphabet01", b"", None),
    ("empty-distance-alphabet02", b"", None),
    ("end-of-stream", None, errors.EndOfStream),
    ("invalid-distance", None, errors.InvalidMatch),
    ("invalid-tree01", None, errors.IncompleteHuffmanTree),
    ("invalid-tree02", None, errors.IncompleteHuffmanTree),
    ("invalid-tree03", None, errors.IncompleteHuffmanTree),
    ("lengths-overflow", None, errors.InvalidDynamicBlockHeader),
    ("out-of-codes", None, errors.InvalidCode),
    ("puff01", None, errors.WrongStoredBlockNlen),
    ("puff02", None, errors.EndOfStream),
    ("puff03", b"\x0a", None),
    ("puff04", None, errors.InvalidCode),
    ("puff05", None, errors.EndOfStream),
    ("puff06", None, errors.EndOfStream),
    ("puff08", None, errors.InvalidCode),
    ("puff09", b"P", None),
    ("puff10", None, errors.InvalidCode),
    ("puff11", None, errors.InvalidMatch),
    ("puff12", None, errors.InvalidDynamicBlockHeader),
    ("puff13", None, errors.IncompleteHuffmanTree),
    ("puff14", None, errors.EndOfStream),
    ("puff15", None, errors.IncompleteHuffmanTree),
    ("puff16", None, errors.InvalidDynamicBlockHeader),
    ("puff17", None, errors.InvalidDynamicBlockHeader),
    ("fuzz1", None, errors.InvalidDynamicBlockHeader),
    ("fuzz2", None, errors.InvalidDynamicBlockHeader),
    ("fuzz3", None, errors.InvalidMatch),
    ("fuzz4", None, errors.OversubscribedHuffmanTree),
    ("puff18", None, errors.OversubscribedHuffmanTree),
    ("puff19", None, errors.OversubscribedHuffmanTree),
    ("puff20", None, errors.OversubscribedHuffmanTree),
    ("puff21", None, errors.OversubscribedHuffmanTree),
    ("puff22", None, errors.OversubscribedHuffmanTree),
    ("puff23", None, errors.InvalidDynamicBlockHeader),
    ("puff24", None, errors.InvalidDynamicBlockHeader),
    ("puff25", None, errors.OversubscribedHuffmanTree),
    ("puff26", None, errors.InvalidDynamicBlockHeader),
    ("puff27", None, errors.InvalidDynamicBlockHeader),
]


@pytest.mark.parametrize("name,expect,err", CASES,
                         ids=[c[0] for c in CASES])
def test_fuzz_case(fuzz_dir, name, expect, err):
    data = (fuzz_dir / f"{name}.input").read_bytes()
    if err is not None:
        with pytest.raises(err):
            inflate_decompress(data, Container.RAW)
    else:
        out = inflate_decompress(data, Container.RAW)
        if isinstance(expect, str):
            expect = (fuzz_dir / expect).read_bytes()
        assert out == expect


def test_concatenated_zlib_streams_reset(fuzz_dir):
    """flate bug 18967: two concatenated zlib streams, decoded via reset."""
    data = (fuzz_dir / "first.input").read_bytes() + \
        (fuzz_dir / "second.input").read_bytes()
    expect = (fuzz_dir / "first.expect").read_bytes() + \
        (fuzz_dir / "second.expect").read_bytes()

    from flate_tpu import zlib as zlib_ns
    d = zlib_ns.decompressor(data)
    out = d.read_all()
    d.reset()
    out += d.read_all()
    assert out == expect
    assert d.at_end()

    # decompress_multi does the same in one shot
    assert decompress_multi(data, Container.ZLIB) == expect


def test_zlib_stored_hello_world():
    """inflate.zig:455-480: zlib-wrapped stored block."""
    data = bytes([
        0x78, 0b10_0_11100,
        0b0000_0001, 0b0000_1100, 0x00, 0b1111_0011, 0xff,
    ]) + b"Hello world\x0a" + bytes([0x1C, 0xF2, 0x04, 0x47])
    from flate_tpu import zlib as zlib_ns
    assert zlib_ns.decompress(data) == b"Hello world\n"
