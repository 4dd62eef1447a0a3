"""Vectorized LSB-first bit packing — the TPU-native replacement for the
reference's serial 64-bit accumulator (/root/reference/src/flate/bit_writer.zig).

Formulation (identical in numpy and jnp so the host spec path and the device
kernel share one algorithm):

    given per-field (value, nbits) with nbits <= 48:
      off    = exclusive_cumsum(nbits)          # bit offset of each field
      word   = off >> 5 ; sh = off & 31         # u32 word + intra-word shift
      v0,v1,v2 = the field value split across <= 3 consecutive u32 words
      out    = scatter-add(zeros, word+{0,1,2}, {v0,v1,v2})

Bits of distinct fields are disjoint, so scatter-add == scatter-or and the
whole pack is a prefix sum plus one scatter — no serial dependency.  Output
u32 words serialized little-endian reproduce DEFLATE's LSB-first bit order.
"""

from __future__ import annotations

import numpy as np

MASK32 = np.uint64(0xFFFFFFFF)


def pack_bits_np(values: np.ndarray, nbits: np.ndarray,
                 bit_offset: int = 0) -> tuple[np.ndarray, int]:
    """Pack (values, nbits) fields LSB-first.

    values: uint64 array (each < 2**nbits, nbits <= 48)
    nbits:  int array of field widths (0 allowed = field skipped)
    bit_offset: number of already-occupied bits at the start of the stream
                (those bits are returned as zeros in the output words).

    Returns (u32 words array, total_bits) where total_bits includes the
    initial offset.
    """
    values = np.asarray(values, dtype=np.uint64)
    nbits = np.asarray(nbits, dtype=np.int64)
    if values.size == 0:
        return np.zeros(1, dtype=np.uint32), bit_offset
    off = bit_offset + np.concatenate([[0], np.cumsum(nbits)[:-1]])
    total_bits = int(bit_offset + nbits.sum())
    # +2 slack words: every field scatters into 3 consecutive slots even
    # when the high parts are zero
    nwords = (total_bits + 31) // 32 + 2
    out = np.zeros(nwords, dtype=np.uint64)

    word = (off >> 5).astype(np.int64)
    sh = (off & 31).astype(np.uint64)

    c0 = values & MASK32
    c1 = values >> np.uint64(32)
    v0 = (c0 << sh) & MASK32
    v1 = ((c0 >> (np.uint64(32) - sh)) | (c1 << sh)) & MASK32
    v2 = c1 >> (np.uint64(32) - sh)
    # sh == 0 -> the >>32 terms are already exact in uint64 (numpy uint64
    # shift by 32 is well-defined), nothing special needed.

    np.add.at(out, word, v0)
    np.add.at(out, word + 1, v1)
    np.add.at(out, word + 2, v2)
    return (out & MASK32).astype(np.uint32), total_bits


def words_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Serialize packed u32 words to the byte stream (complete bytes only)."""
    nbytes = (total_bits + 7) // 8
    return words.astype("<u4").tobytes()[:nbytes]


class BitSink:
    """Accumulating bit stream built from vectorized pack calls.

    Replaces the reference's BitWriter at the stream level: supports appending
    packed fields, byte-aligning (flush), and splicing in byte-aligned data
    (stored blocks).  State between appends is (bytes so far, partial byte,
    bit position in partial byte).
    """

    def __init__(self) -> None:
        self._done = bytearray()
        self._partial = 0      # bits of the unfinished byte (value)
        self._npartial = 0     # how many bits of _partial are valid

    @property
    def bit_length(self) -> int:
        return len(self._done) * 8 + self._npartial

    def append_fields(self, values: np.ndarray, nbits: np.ndarray) -> None:
        if len(np.atleast_1d(values)) == 0:
            return
        words, total_bits = pack_bits_np(values, nbits, self._npartial)
        if self._npartial:
            words[0] |= np.uint32(self._partial)
        raw = words.astype("<u4").tobytes()
        full_bytes = total_bits // 8
        self._done += raw[:full_bytes]
        rem = total_bits - full_bytes * 8
        self._partial = raw[full_bytes] if rem else 0
        self._npartial = rem

    def append_packed(self, words: np.ndarray, total_bits: int) -> None:
        """Append a pre-packed bit run (words from pack_bits_np with
        bit_offset=0)."""
        if total_bits == 0:
            return
        if self._npartial == 0:
            raw = words.astype("<u4").tobytes()
            full = total_bits // 8
            self._done += raw[:full]
            rem = total_bits - full * 8
            self._partial = raw[full] if rem else 0
            self._npartial = rem
            return
        # need a bit-shift splice: shift whole run left by _npartial bits
        w = words.astype(np.uint64)
        sh = np.uint64(self._npartial)
        shifted = np.zeros(w.size + 1, dtype=np.uint64)
        shifted[:-1] = (w << sh) & MASK32
        carry = w >> (np.uint64(32) - sh)
        shifted[1:] |= carry
        shifted[0] |= np.uint64(self._partial)
        nb = self._npartial + total_bits
        self._partial = 0
        self._npartial = 0
        raw = (shifted & MASK32).astype("<u4").tobytes()
        full = nb // 8
        self._done += raw[:full]
        rem = nb - full * 8
        self._partial = raw[full] if rem else 0
        self._npartial = rem

    def align_to_byte(self) -> None:
        """Pad with zero bits to the next byte boundary (bit_writer flush)."""
        if self._npartial:
            self._done.append(self._partial)
            self._partial = 0
            self._npartial = 0

    def append_bytes(self, data: bytes) -> None:
        """Byte-aligned passthrough (stored-block payloads).  Requires byte
        alignment, mirroring bit_writer.zig:81-97."""
        if self._npartial:
            from .errors import UnfinishedBits
            raise UnfinishedBits("append_bytes requires byte alignment")
        self._done += data

    def getvalue(self) -> bytes:
        """Final byte stream; implicit align_to_byte on the tail."""
        out = bytes(self._done)
        if self._npartial:
            out += bytes([self._partial])
        return out
