"""RFC 1951 code tables as numpy arrays (device-exportable).

These are derived from the DEFLATE specification (RFC 1951 §3.2.5-3.2.6), the
same data the reference bakes into /root/reference/src/flate/Token.zig:114-276
and huffman_encoder.zig:298-338.  All tables are numpy so they can be used by
host framing code and shipped to TPU kernels via jnp.asarray.
"""

import numpy as np

from . import consts

# ---------------------------------------------------------------------------
# Length codes (RFC 1951 §3.2.5): 29 codes 257..285 covering lengths 3..258.
# ---------------------------------------------------------------------------

# (extra_bits, base_length) per length code index 0..28 (code = 257 + index)
_LENGTH_CODE_DEFS = [
    (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (1, 11), (1, 13), (1, 15), (1, 17),
    (2, 19), (2, 23), (2, 27), (2, 31),
    (3, 35), (3, 43), (3, 51), (3, 59),
    (4, 67), (4, 83), (4, 99), (4, 115),
    (5, 131), (5, 163), (5, 195), (5, 227),
    (0, 258),
]

LENGTH_EXTRA_BITS = np.array([e for e, _ in _LENGTH_CODE_DEFS], dtype=np.int32)
LENGTH_BASE = np.array([b for _, b in _LENGTH_CODE_DEFS], dtype=np.int32)

# length (3..258) -> length code index (0..28); index by length - 3.
LENGTH_TO_CODE = np.zeros(256, dtype=np.int32)
for _i, (_e, _b) in enumerate(_LENGTH_CODE_DEFS):
    _hi = 259 if _i == 28 else _LENGTH_CODE_DEFS[_i + 1][1]
    LENGTH_TO_CODE[_b - 3:_hi - 3] = _i
LENGTH_TO_CODE[258 - 3] = 28  # length 258 uses code 285 (0 extra bits)

# ---------------------------------------------------------------------------
# Distance codes (RFC 1951 §3.2.5): 30 codes covering distances 1..32768.
# ---------------------------------------------------------------------------

_DIST_CODE_DEFS = [
    (0, 1), (0, 2), (0, 3), (0, 4),
    (1, 5), (1, 7),
    (2, 9), (2, 13),
    (3, 17), (3, 25),
    (4, 33), (4, 49),
    (5, 65), (5, 97),
    (6, 129), (6, 193),
    (7, 257), (7, 385),
    (8, 513), (8, 769),
    (9, 1025), (9, 1537),
    (10, 2049), (10, 3073),
    (11, 4097), (11, 6145),
    (12, 8193), (12, 12289),
    (13, 16385), (13, 24577),
]

DIST_EXTRA_BITS = np.array([e for e, _ in _DIST_CODE_DEFS], dtype=np.int32)
DIST_BASE = np.array([b for _, b in _DIST_CODE_DEFS], dtype=np.int32)


def _dist_to_code_table() -> np.ndarray:
    """distance (1..32768) -> distance code, as a dense table indexed d-1."""
    t = np.zeros(consts.MAX_DISTANCE, dtype=np.int32)
    for i, (e, b) in enumerate(_DIST_CODE_DEFS):
        hi = consts.MAX_DISTANCE + 1 if i == 29 else _DIST_CODE_DEFS[i + 1][1]
        t[b - 1:hi - 1] = i
    return t


DIST_TO_CODE = _dist_to_code_table()

# Compact O(1) distance->code without the 32K table: code = lut[d>>shift]
# style 3-range lookup (mirrors the scheme of Token.zig:70-87 but derived from
# the code ranges above).  dist_code(d) for d in 1..32768:
#   d <= 256          -> DIST_TO_CODE_SMALL[d-1]
#   d <= 32768        -> via high bits
DIST_TO_CODE_SMALL = DIST_TO_CODE[:256].copy()


def dist_code_np(d: np.ndarray) -> np.ndarray:
    """Vectorized distance->code (d in 1..32768)."""
    return DIST_TO_CODE[d - 1]


def length_code_np(length: np.ndarray) -> np.ndarray:
    """Vectorized match-length->code-index (length in 3..258)."""
    return LENGTH_TO_CODE[length - 3]


# ---------------------------------------------------------------------------
# Fixed Huffman code lengths (RFC 1951 §3.2.6).
# ---------------------------------------------------------------------------

FIXED_LITLEN_LENS = np.concatenate([
    np.full(144, 8), np.full(112, 9), np.full(24, 7), np.full(8, 8),
]).astype(np.int32)          # 288 entries
FIXED_DIST_LENS = np.full(consts.NUM_DIST_CODES, 5, dtype=np.int32)

CODEGEN_ORDER = np.array(consts.CODEGEN_ORDER, dtype=np.int32)


def reverse_bits(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Bit-reverse each code within its own length (canonical Huffman codes
    are emitted MSB-first into DEFLATE's LSB-first bitstream)."""
    codes = codes.astype(np.uint32)
    out = np.zeros_like(codes)
    work = codes.copy()
    for _ in range(consts.MAX_CODE_BITS):
        out = (out << 1) | (work & 1)
        work = work >> 1
    # out now holds the 15-bit reversal; shift down to the code's own width
    return (out >> (consts.MAX_CODE_BITS - lens).astype(np.uint32)) * (lens > 0)


def canonical_codes(lens: np.ndarray) -> np.ndarray:
    """Assign canonical Huffman codes from code lengths (RFC 1951 §3.2.2),
    already bit-reversed for LSB-first emission.  lens: int array of code
    lengths (0 = unused).  Returns uint32 codes.  Fully vectorized: the
    within-length rank of each symbol is its position among same-length
    symbols in symbol order (a stable argsort by length)."""
    lens = np.asarray(lens, dtype=np.int64)
    max_bits = int(lens.max()) if lens.size else 0
    if max_bits == 0:
        return np.zeros(lens.shape, dtype=np.uint32)
    bl_count = np.bincount(lens, minlength=max_bits + 1).astype(np.uint64)
    bl_count[0] = 0
    # first canonical code per length
    first = np.zeros(max_bits + 1, dtype=np.uint64)
    code = np.uint64(0)
    for bits in range(1, max_bits + 1):
        code = (code + bl_count[bits - 1]) << np.uint64(1)
        first[bits] = code
    # rank of each symbol within its length class (symbol order): stable
    # argsort puts zero-length symbols first, then classes ascending
    order = np.argsort(lens, kind="stable")
    ranked = np.empty(lens.size, dtype=np.int64)
    ranked[order] = np.arange(lens.size)
    zeros = int((lens == 0).sum())
    # cum_before[l] = number of symbols with length in [1, l)
    cum_before = np.zeros(max_bits + 2, dtype=np.int64)
    cum_before[2:] = np.cumsum(bl_count[1:].astype(np.int64))
    rank_in_class = ranked - zeros - cum_before[np.maximum(lens, 1)]
    codes = np.where(
        lens > 0,
        first[np.maximum(lens, 1)] + rank_in_class.astype(np.uint64),
        0).astype(np.uint32)
    return reverse_bits(codes, lens.astype(np.int32))


FIXED_LITLEN_CODES = canonical_codes(FIXED_LITLEN_LENS)
FIXED_DIST_CODES = canonical_codes(FIXED_DIST_LENS)
