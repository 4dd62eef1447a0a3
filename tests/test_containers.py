"""Container header/footer framing: error cases + gzip metadata.

Mirrors the reference's header/footer error tests (src/flate.zig:255-354)
and the v1 gzip metadata capability (v1/gzip.zig:22-158).
"""

import struct

import pytest

import flate_tpu as ft
from flate_tpu import errors
from flate_tpu.containers import (
    Container, GzipMetadata, Hasher, parse_header, write_footer,
    write_header,
)


def _valid_gzip() -> bytes:
    return ft.gzip.compress(b"hello world payload")


def _valid_zlib() -> bytes:
    return ft.zlib.compress(b"hello world payload")


def test_gzip_header_errors():
    blob = bytearray(_valid_gzip())
    with pytest.raises(errors.EndOfStream):
        ft.gzip.decompress(bytes(blob[:5]))
    bad = blob.copy()
    bad[0] = 0x1E
    with pytest.raises(errors.BadGzipHeader):
        ft.gzip.decompress(bytes(bad))
    bad = blob.copy()
    bad[2] = 0x09  # CM != deflate
    with pytest.raises(errors.BadGzipHeader):
        ft.gzip.decompress(bytes(bad))


def test_gzip_footer_errors():
    blob = bytearray(_valid_gzip())
    bad = blob.copy()
    bad[-5] ^= 0xFF  # corrupt CRC
    with pytest.raises(errors.WrongGzipChecksum):
        ft.gzip.decompress(bytes(bad))
    bad = blob.copy()
    bad[-1] ^= 0xFF  # corrupt ISIZE
    with pytest.raises(errors.WrongGzipSize):
        ft.gzip.decompress(bytes(bad))
    with pytest.raises(errors.EndOfStream):
        ft.gzip.decompress(bytes(blob[:-4]))


def test_zlib_header_errors():
    blob = bytearray(_valid_zlib())
    bad = blob.copy()
    bad[0] = 0x79  # bad CM/CINFO mix -> fcheck fails too
    with pytest.raises(errors.BadZlibHeader):
        ft.zlib.decompress(bytes(bad))
    # CINFO > 7
    bad = blob.copy()
    bad[0] = 0x88
    with pytest.raises(errors.BadZlibHeader):
        ft.zlib.decompress(bytes(bad))


def test_zlib_footer_errors():
    blob = bytearray(_valid_zlib())
    bad = blob.copy()
    bad[-1] ^= 0x01
    with pytest.raises(errors.WrongZlibChecksum):
        ft.zlib.decompress(bytes(bad))


def test_gzip_metadata_roundtrip():
    meta = GzipMetadata(filename=b"hello.txt", comment=b"a comment",
                        extra=b"xx", mtime=1234567890, os=3)
    blob = ft.gzip.compress(b"payload bytes", meta=meta)
    consumed, parsed = parse_header(Container.GZIP, blob)
    assert parsed.filename == b"hello.txt"
    assert parsed.comment == b"a comment"
    assert parsed.extra == b"xx"
    assert parsed.mtime == 1234567890
    assert ft.gzip.decompress(blob) == b"payload bytes"
    # system gzip compatibility
    import gzip as pygzip
    assert pygzip.decompress(blob) == b"payload bytes"


def test_gzip_fhcrc_verification():
    """Header with FHCRC: correct passes, corrupted fails."""
    import flate_tpu.checksums as ck
    hdr = bytearray([0x1F, 0x8B, 0x08, 0x02, 0, 0, 0, 0, 0x00, 0x03])
    hcrc = ck.crc32(bytes(hdr)) & 0xFFFF
    good = bytes(hdr) + struct.pack("<H", hcrc)
    consumed, _ = parse_header(Container.GZIP, good + b"rest")
    assert consumed == 12
    bad = bytes(hdr) + struct.pack("<H", hcrc ^ 1)
    with pytest.raises(errors.BadGzipHeader):
        parse_header(Container.GZIP, bad + b"rest")


def test_hasher_values():
    import zlib as pyzlib
    h = Hasher(Container.GZIP)
    h.update(b"abc")
    h.update(b"def")
    assert h.chksum() == pyzlib.crc32(b"abcdef")
    assert h.nbytes == 6
    h = Hasher(Container.ZLIB)
    h.update(b"abcdef")
    assert h.chksum() == pyzlib.adler32(b"abcdef")


def test_header_bytes_exact():
    assert write_header(Container.GZIP) == \
        bytes([0x1F, 0x8B, 0x08, 0x00, 0, 0, 0, 0, 0x00, 0x03])
    assert write_header(Container.ZLIB) == bytes([0x78, 0x9C])
    assert write_header(Container.RAW) == b""


def test_gzip_fhcrc_write_roundtrip():
    """write_header(hcrc=True) produces a header our own parser and
    system gzip both accept (FHCRC write side: v1/gzip.zig parity)."""
    import gzip as pygzip
    import zlib as pyzlib
    meta = GzipMetadata(filename=b"x.txt", comment=b"c", mtime=7,
                        hcrc=True)
    hdr = write_header(Container.GZIP, meta)
    consumed, parsed = parse_header(Container.GZIP, hdr + b"tail")
    assert consumed == len(hdr)
    assert parsed.filename == b"x.txt" and parsed.comment == b"c"
    # full stream with a deflate body decodes through CPython gzip
    data = b"fhcrc write body " * 100
    h = Hasher(Container.GZIP)
    h.update(data)
    blob = hdr + pyzlib.compress(data)[2:-4] + \
        write_footer(Container.GZIP, h)
    assert pygzip.decompress(blob) == data
    # corrupting any header byte breaks the CRC16
    bad = bytearray(hdr)
    bad[5] ^= 0xFF
    with pytest.raises(errors.BadGzipHeader):
        parse_header(Container.GZIP, bytes(bad))
