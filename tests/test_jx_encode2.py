"""Device stream construction (jx/encode2.py) end-to-end on CPU.

The contract: packing the device-built field sequence per shard and
concatenating the byte-aligned shard streams yields a raw deflate stream
that decodes — with both zlib and the repo's own strict decoder — back
to the original bytes, across all four shard representations.
"""

import zlib as pyzlib

import numpy as np
import pytest

import jax.numpy as jnp

from flate_tpu import consts
from flate_tpu.bitpack import pack_bits_np
from flate_tpu.jx import encode2, match2
from flate_tpu.jx import parse as prs

CTX = 1024
S = match2.TILE - CTX


def _encode(rows, valid_lens, level_k=16, ctx_lens=None):
    """rows: list of S-byte arrays (zero-padded beyond valid)."""
    B = len(rows)
    window = np.zeros((B, CTX + S), np.uint8)
    for b, r in enumerate(rows):
        window[b, CTX:] = r
    if ctx_lens is None:
        ctx_lens = np.zeros(B, np.int32)
    valid = np.asarray(valid_lens, np.int32)
    final = np.zeros(B, np.int32)
    final[B - 1] = 1
    mlen, mdist = match2.find_matches_fused(
        jnp.asarray(window), jnp.asarray(ctx_lens), jnp.asarray(valid),
        K=level_k, nw=4, ctx=CTX, interpret=True)
    take, _ = prs.decide(mlen, mdist, True, 32)
    starts = prs.parse_doubling(mlen, mdist, start=CTX, lazy=True,
                                max_lazy=32)
    vals, bits, total_bits, kind = encode2.build_fields(
        jnp.asarray(window[:, CTX:]), mlen[:, CTX:], mdist[:, CTX:],
        starts[:, CTX:], take[:, CTX:], jnp.asarray(valid),
        jnp.asarray(final), S)
    vals, bits = np.asarray(vals), np.asarray(bits)
    total_bits = np.asarray(total_bits)
    stream = b""
    for b in range(B):
        live = bits[b] > 0
        words, tb = pack_bits_np(vals[b][live].astype(np.uint64),
                                 bits[b][live])
        assert tb == int(total_bits[b])
        assert tb % 8 == 0, "shard stream must end byte-aligned"
        stream += words.tobytes()[:tb // 8]
    return stream, np.asarray(kind)


def _roundtrip(stream, expect):
    out = pyzlib.decompressobj(-15).decompress(stream)
    assert out == expect, (len(out), len(expect))
    from flate_tpu import flate
    assert flate.decompress(stream) == expect


def test_text_shards_dynamic():
    rng = np.random.default_rng(0)
    words = [b"the quick ", b"brown fox ", b"jumps over", b"lazy dogs "]
    data = b"".join(words[rng.integers(0, 4)] for _ in range(2 * S // 10 + 2))
    data = data[:2 * S]
    rows = [np.frombuffer(data[i * S:(i + 1) * S], np.uint8)
            for i in range(2)]
    stream, kind = _encode(rows, [S, S])
    assert (kind[:2] == encode2.KIND_DYN).all()
    _roundtrip(stream, data[:2 * S])


def test_random_shard_stored():
    rng = np.random.default_rng(1)
    row = rng.integers(0, 256, S, dtype=np.uint8)
    stream, kind = _encode([row], [S])
    assert kind[0] == encode2.KIND_STO
    _roundtrip(stream, row.tobytes())
    # stored must cost at most valid + block overhead
    assert len(stream) <= S + 3 * 5 + 8


def test_digits_literal_or_dyn():
    rng = np.random.default_rng(2)
    row = rng.integers(48, 58, S, dtype=np.uint8)   # digit soup
    stream, kind = _encode([row], [S])
    _roundtrip(stream, row.tobytes())


def test_tail_shard_partial():
    rng = np.random.default_rng(3)
    n = 777
    row = np.zeros(S, np.uint8)
    row[:n] = np.frombuffer(b"abcabcabc" * 100, np.uint8)[:n]
    stream, kind = _encode([row], [n])
    _roundtrip(stream, row[:n].tobytes())


def test_empty_shard():
    stream, kind = _encode([np.zeros(S, np.uint8)], [0])
    _roundtrip(stream, b"")


def test_mixed_batch_with_flush_markers():
    rng = np.random.default_rng(4)
    r_text = np.frombuffer(b"hello world, " * (S // 13 + 1), np.uint8)[:S]
    r_rand = rng.integers(0, 256, S, dtype=np.uint8)
    r_tail = np.zeros(S, np.uint8)
    r_tail[:100] = 65
    stream, kind = _encode([r_text, r_rand, r_tail], [S, S, 100])
    expect = r_text.tobytes() + r_rand.tobytes() + r_tail[:100].tobytes()
    _roundtrip(stream, expect)


def test_stored_block_split_large_shard():
    """Shards > 65535 bytes must split stored output into multiple
    stored blocks with mid-stream headers."""
    S2 = 131072
    rng = np.random.default_rng(5)
    row = rng.integers(0, 256, S2, dtype=np.uint8)
    window = row[None, :]
    B = 1
    mlen = jnp.zeros((B, S2), jnp.int32)
    mdist = jnp.zeros((B, S2), jnp.int32)
    starts = jnp.ones((B, S2), bool)
    take = jnp.zeros((B, S2), bool)
    vals, bits, total_bits, kind = encode2.build_fields(
        jnp.asarray(window), mlen, mdist, starts, take,
        jnp.asarray([S2], np.int32), jnp.asarray([1], np.int32), S2)
    assert int(kind[0]) == encode2.KIND_STO
    vals, bits = np.asarray(vals)[0], np.asarray(bits)[0]
    live = bits > 0
    words, tb = pack_bits_np(vals[live].astype(np.uint64), bits[live])
    stream = words.tobytes()[:tb // 8]
    _roundtrip(stream, row.tobytes())
