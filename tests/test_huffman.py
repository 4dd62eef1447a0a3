"""Huffman construction and decode-table properties."""

import numpy as np
import pytest

from flate_tpu import consts, huffman, tables
from flate_tpu.errors import (
    IncompleteHuffmanTree,
    MissingEndOfBlockCode,
    OversubscribedHuffmanTree,
)
from flate_tpu.inflate import build_decode_table, check_completeness

RNG = np.random.default_rng(7)


def _kraft(lens):
    lens = np.asarray(lens)
    return sum(2.0 ** -l for l in lens[lens > 0])


@pytest.mark.parametrize("seed", range(20))
def test_lengths_valid_and_optimalish(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 286))
    freq = np.zeros(286, dtype=np.int64)
    used = rng.choice(286, size=n, replace=False)
    freq[used] = rng.integers(1, 100000, size=n)
    lens = huffman.huffman_code_lengths(freq, consts.MAX_CODE_BITS)
    assert (lens[freq == 0] == 0).all()
    assert (lens[freq > 0] > 0).all()
    assert lens.max() <= consts.MAX_CODE_BITS
    k = _kraft(lens)
    assert k <= 1.0 + 1e-12
    if n >= 2:
        assert abs(k - 1.0) < 1e-12  # complete code


def test_skewed_frequencies_hit_limit():
    """Fibonacci-like frequencies force depth > 15; repair must hold."""
    freq = np.zeros(40, dtype=np.int64)
    a, b = 1, 1
    for i in range(40):
        freq[i] = a
        a, b = b, a + b
    lens = huffman.huffman_code_lengths(freq, 15)
    assert lens.max() == 15
    assert abs(_kraft(lens) - 1.0) < 1e-12


def test_single_and_double_symbol():
    freq = np.zeros(286, dtype=np.int64)
    freq[65] = 10
    lens = huffman.huffman_code_lengths(freq, 15)
    assert lens[65] == 1 and lens.sum() == 1
    freq[66] = 1
    lens = huffman.huffman_code_lengths(freq, 15)
    assert lens[65] == 1 and lens[66] == 1


def test_fixed_tables_canonical():
    """Fixed-tree canonical codes: RFC 1951 §3.2.6 values (bit-reversed)."""
    # literal 0 has 8-bit code 00110000 -> reversed 00001100
    assert tables.FIXED_LITLEN_CODES[0] == 0b00001100
    # code 256 (EOB) is 7-bit 0000000
    assert tables.FIXED_LITLEN_CODES[256] == 0
    assert tables.FIXED_LITLEN_LENS[256] == 7
    # literal 144 has 9-bit code 110010000 -> reversed 000010011
    assert tables.FIXED_LITLEN_CODES[144] == 0b000010011
    # literal 280: 8-bit code 11000000 -> reversed 00000011
    assert tables.FIXED_LITLEN_CODES[280] == 0b00000011


@pytest.mark.parametrize("seed", range(10))
def test_encode_decode_table_roundtrip(seed):
    """Property: decoding every symbol's own code yields the symbol
    (mirrors the reference's 285-case roundtrip property test,
    huffman_decoder.zig:179-308)."""
    rng = np.random.default_rng(seed)
    freq = np.zeros(286, dtype=np.int64)
    used = rng.choice(285, size=int(rng.integers(2, 285)), replace=False)
    freq[used] = rng.integers(1, 1000, size=used.size)
    freq[256] = 1  # EOB always present
    lens = huffman.huffman_code_lengths(freq, consts.MAX_CODE_BITS)
    codes = tables.canonical_codes(lens)
    sym_t, bits_t = build_decode_table(lens, consts.MAX_CODE_BITS,
                                       is_litlen=True)
    for s in np.nonzero(lens)[0]:
        peek = int(codes[s])  # low bits = the code (LSB-first)
        assert sym_t[peek] == s
        assert bits_t[peek] == lens[s]


def test_completeness_checks():
    lens = np.zeros(286, dtype=np.int32)
    with pytest.raises(MissingEndOfBlockCode):
        check_completeness(lens, 15, is_litlen=True)
    # oversubscribed: three 1-bit codes
    lens = np.zeros(30, dtype=np.int32)
    lens[:3] = 1
    with pytest.raises(OversubscribedHuffmanTree):
        check_completeness(lens, 15, is_litlen=False)
    # incomplete, not single-code form
    lens = np.zeros(30, dtype=np.int32)
    lens[:2] = 3
    with pytest.raises(IncompleteHuffmanTree):
        check_completeness(lens, 15, is_litlen=False)
    # single length-1 code: allowed for 15-bit decoders...
    lens = np.zeros(30, dtype=np.int32)
    lens[5] = 1
    check_completeness(lens, 15, is_litlen=False)
    # ...but not for the 7-bit codegen decoder
    lens = np.zeros(19, dtype=np.int32)
    lens[5] = 1
    with pytest.raises(IncompleteHuffmanTree):
        check_completeness(lens, 7, is_litlen=False)
    # empty tree allowed
    check_completeness(np.zeros(30, dtype=np.int32), 15, is_litlen=False)
