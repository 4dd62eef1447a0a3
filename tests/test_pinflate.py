"""Thread-parallel host decode of independent FLT1-indexed members."""
import struct
import zlib

import pytest

from flate_tpu import native, pinflate, shard_index
from flate_tpu.containers import Container, GzipMetadata, write_header

pytestmark = pytest.mark.skipif(not native.inflate_available(),
                                reason="native decoder unavailable")


def build_indexed_member(chunks, flags=shard_index.FLAG_INDEPENDENT):
    """Assemble a gzip member from independent per-chunk deflate shards
    (non-final shards end in a sync flush, exactly like the device
    encoder's independent mode)."""
    shards = []
    for i, c in enumerate(chunks):
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        if i + 1 < len(chunks):
            shards.append(co.compress(c) + co.flush(zlib.Z_SYNC_FLUSH))
        else:
            shards.append(co.compress(c) + co.flush(zlib.Z_FINISH))
    extra = shard_index.build_index_extra(
        [len(s) for s in shards], [len(c) for c in chunks], flags)
    hdr = write_header(Container.GZIP, GzipMetadata(extra=extra))
    data = b"".join(chunks)
    foot = struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF)
    return hdr + b"".join(shards) + foot, data


def _chunks(n, size=65536):
    base = b"independent shard parallel decode corpus %d "
    return [(base % i) * (size // 48 + 1) for i in range(n)]


def test_parallel_decode_matches():
    blob, data = build_indexed_member(_chunks(16))
    assert pinflate.decompress_indexed(blob, threads=8) == data
    assert pinflate.decompress_indexed(blob, threads=1) == data


def test_fallback_without_independent_flag():
    blob, data = build_indexed_member(_chunks(4), flags=0)
    # sequential fallback must still decode correctly
    assert pinflate.decompress_indexed(blob) == data


def test_corrupt_crc_detected():
    blob, data = build_indexed_member(_chunks(4))
    bad = bytearray(blob)
    bad[-6] ^= 0xFF
    with pytest.raises(Exception):
        pinflate.decompress_indexed(bytes(bad))


def test_interop_plain_gzip_reads_indexed_member():
    import gzip as pygzip
    blob, data = build_indexed_member(_chunks(6))
    assert pygzip.decompress(blob) == data


def test_malicious_index_falls_back_or_errors():
    """The index is attacker-controlled; lying entries must never crash
    or return wrong data — either the strict sequential decoder takes
    over (raising its protocol errors) or a FlateError surfaces."""
    from flate_tpu import errors
    blob, data = build_indexed_member(_chunks(4))
    # rewrite the index with oversized comp_lens (points past the end)
    hdr = bytearray(blob[:100])
    # find the FT subfield payload and corrupt a comp_len field
    pos = blob.index(b"FT")
    bad = bytearray(blob)
    struct.pack_into("<I", bad, pos + 8, 0x7FFFFFFF)
    try:
        out = pinflate.decompress_indexed(bytes(bad))
        assert out == data          # sequential fallback got it right
    except errors.FlateError:
        pass                        # strict error is also acceptable


def test_zero_shard_index_falls_back():
    blob, data = build_indexed_member(_chunks(3))
    pos = blob.index(b"FT")
    bad = bytearray(blob)
    struct.pack_into("<H", bad, pos + 6, 0)     # n_shards = 0
    # index no longer matches its length -> treated as absent
    from flate_tpu import pinflate as pi
    out = pi.decompress_indexed(bytes(bad))
    assert out == data
