"""Device inflate (jx.inflate2) on CPU: index plumbing + end-to-end.

Streams come from the v2 device encoder (which writes the FLT1 shard
index); decode runs the full three-pass device path in interpret mode
and must match both the original bytes and the host decoder.
"""

import gzip as pygzip

import numpy as np
import pytest

import flate_tpu as ft
from flate_tpu.containers import Container
from flate_tpu.jx import inflate2, pipeline2

S = 7168
CTX = 1024


def _compress(data, level=6, batch=3):
    return pipeline2.compress_device2(
        data, level=level, shard_len=S, ctx=CTX, batch=batch,
        interpret=True)


def _decompress(blob, batch=3):
    return inflate2.decompress_device(blob, batch=batch, interpret=True)


def test_index_extra_roundtrip():
    comp = [123, 45678, 1]
    outl = [7168, 7168, 33]
    extra = inflate2.build_index_extra(comp, outl)
    got = inflate2.parse_index_extra(extra)
    assert got is not None
    np.testing.assert_array_equal(got[0], comp)
    np.testing.assert_array_equal(got[1], outl)
    # foreign subfields before ours are skipped
    got2 = inflate2.parse_index_extra(b"XX\x03\x00abc" + extra)
    assert got2 is not None and list(got2[0]) == comp
    assert inflate2.parse_index_extra(b"XX\x03\x00abc") is None


def test_indexed_stream_standard_tools(rfc_text):
    """The FLT1 EXTRA subfield must not disturb standard decoders."""
    data = rfc_text[:2 * S + 500]
    blob = _compress(data)
    assert pygzip.decompress(blob) == data
    assert ft.gzip.decompress(blob) == data


@pytest.mark.parametrize("level", [1, 6, 9])
def test_device_decode_text(rfc_text, level):
    data = rfc_text[:3 * S + 500]
    blob = _compress(data, level=level)
    assert _decompress(blob) == data


def test_device_decode_tiny_and_empty():
    assert _decompress(_compress(b"")) == b""
    assert _decompress(_compress(b"x")) == b"x"
    assert _decompress(_compress(b"hello" * 3)) == b"hello" * 3


def test_device_decode_stored_shards():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 2 * S + 77, dtype=np.uint8))
    blob = _compress(data)
    assert _decompress(blob) == data


def test_device_decode_cross_shard_matches():
    rng = np.random.default_rng(7)
    period = bytes(rng.integers(0, 256, CTX, dtype=np.uint8))
    data = period * (2 * S // CTX)
    blob = _compress(data)
    assert _decompress(blob) == data


def test_device_decode_multi_member(rfc_text):
    data1 = rfc_text[:S + 99]
    data2 = b"second member " * 100
    blob = _compress(data1) + _compress(data2)
    assert _decompress(blob) == data1 + data2


def test_device_decode_checksum_verified(rfc_text):
    data = rfc_text[:S]
    blob = bytearray(_compress(data))
    blob[-5] ^= 0xFF                      # corrupt CRC32 footer
    with pytest.raises(ft.errors.WrongGzipChecksum):
        _decompress(bytes(blob))


def test_unindexed_stream_raises_lookup(rfc_text):
    blob = ft.gzip.compress(rfc_text[:2000], level=6)
    with pytest.raises(LookupError):
        _decompress(blob)


def test_device_decode_segmented_member(rfc_text):
    """Shards whose interior mixes compressible and incompressible
    spans emit multiple blocks per shard (intra-shard segmentation);
    the indexed fast path cannot walk them and must re-route the member
    through the chained device path with exact index entries."""
    rng = np.random.default_rng(9)
    t = np.frombuffer(rfc_text[:2048], np.uint8)
    parts = []
    for _ in range(4):
        parts += [t, rng.integers(0, 256, 3 * 1024, dtype=np.uint8), t]
    data = np.concatenate(parts).tobytes()
    blob = _compress(data)
    assert _decompress(blob) == data
    assert ft.gzip.decompress(blob) == data
    # corruption through the re-routed path still raises exactly
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ft.errors.FlateError):
        _decompress(bytes(bad))


def test_propagate_match_fields_paths_agree():
    """The packed scatter-max fast path (S <= 128K) and the owner-slot
    fallback (anyinflate blocks beyond the 32-bit pack) must produce
    identical per-byte (o_ism, o_dist) fields."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    B, NS = 3, 64
    counts = rng.integers(2, NS, B)
    offs_l, ism_l, dist_l = [], [], []
    live_l = []
    for b in range(B):
        o, off = [], 0
        ism, dst = [], []
        for _ in range(int(counts[b]) - 1):
            m = rng.integers(0, 2)
            ln = int(rng.integers(3, 20)) if m else 1
            o.append(off)
            ism.append(m)
            dst.append(int(rng.integers(1, 1 << 15)))
            off += ln
        pad = NS - len(o)
        offs_l.append(o + [0] * pad)
        ism_l.append(ism + [0] * pad)
        dist_l.append(dst + [1] * pad)
        live_l.append([True] * len(o) + [False] * pad)
    offs = jnp.asarray(offs_l, jnp.int32)
    is_m = jnp.asarray(ism_l, jnp.int32) > 0
    dist = jnp.asarray(dist_l, jnp.int32)
    live = jnp.asarray(live_l)
    import flate_tpu.jx.inflate2 as i2

    fast = i2.propagate_match_fields(live, is_m, offs, dist, 1 << 10)
    # force the fallback branch by monkeypatching the static threshold:
    # call the same math with S just over the pack bound via a large-S
    # call truncated back down
    big = i2.propagate_match_fields(live, is_m, offs, dist, (1 << 17) + 1024)
    ism_f, dist_f = (np.asarray(a) for a in fast)
    ism_b, dist_b = (np.asarray(a)[:, :1 << 10] for a in big)
    np.testing.assert_array_equal(ism_f, ism_b)
    # o_dist is only defined (and only read — boundary ignores prev_d
    # when prev_m is false) where the owning symbol is a match
    m = ism_f > 0
    np.testing.assert_array_equal(dist_f[m], dist_b[m])
