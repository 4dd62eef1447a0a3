"""CRC32 and Adler32: host paths, parallel TPU (jnp) kernels, and combine math.

The reference uses std.hash.Crc32 / std.hash.Adler32 rolled inline with stream
I/O (/root/reference/src/flate/container.zig:168-206).  On TPU both checksums
are reformulated as data-parallel reductions:

* Adler32 is two modular prefix sums — embarrassingly parallel.
* CRC32 is linear over GF(2): crc(A || B) = shift(crc(A), len(B)) ^ crc(B),
  so shards are checksummed independently and combined with the byte-shift
  operator (a 32x32 GF(2) matrix power).  The same identity powers the
  multi-chip combine in flate_tpu.parallel.

The host paths use CPython's zlib (madler/zlib) and double as the differential
oracle for the device kernels.
"""

from __future__ import annotations

import functools
import zlib

import numpy as np

ADLER_MOD = 65521
CRC_POLY = 0xEDB88320  # reflected CRC-32 (IEEE 802.3)


# ---------------------------------------------------------------------------
# Host paths (oracle)
# ---------------------------------------------------------------------------

_NATIVE_MIN = 1 << 16   # ctypes call overhead beats zlib below ~64 KiB


def crc32(data: bytes, value: int = 0) -> int:
    if len(data) >= _NATIVE_MIN:
        from . import native
        r = native.crc32(data, value)
        if r is not None:
            return r
    return zlib.crc32(data, value) & 0xFFFFFFFF


def adler32(data: bytes, value: int = 1) -> int:
    if len(data) >= _NATIVE_MIN:
        from . import native
        r = native.adler32(data, value)
        if r is not None:
            return r
    return zlib.adler32(data, value) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# CRC32 combine — GF(2) matrix algebra (independent derivation of the
# classic crc32_combine construction).
# ---------------------------------------------------------------------------

def _gf2_matrix_times(mat: np.ndarray, vec: int) -> int:
    total = 0
    i = 0
    while vec:
        if vec & 1:
            total ^= int(mat[i])
        vec >>= 1
        i += 1
    return total


def _gf2_matrix_square(mat: np.ndarray) -> np.ndarray:
    return np.array([_gf2_matrix_times(mat, int(v)) for v in mat], dtype=np.uint64)


def _crc_shift_operator() -> np.ndarray:
    """Matrix applying one zero *bit* to a CRC register."""
    mat = np.zeros(32, dtype=np.uint64)
    mat[0] = CRC_POLY
    row = 1
    for i in range(1, 32):
        mat[i] = row
        row <<= 1
    return mat


@functools.lru_cache(maxsize=256)
def _crc_shift_cols(len2: int) -> tuple:
    """Columns of the finalized-crc shift-by-len2-zero-bytes operator,
    plus its affine constant (crc32_combine(x, 0, len2) is affine in x
    over GF(2)).  Cached per length: compress/decompress paths combine
    thousands of SAME-LENGTH shards, and rebuilding the matrix powers
    per call was 0.8 s of pure Python per 32 MiB (chip cProfile)."""
    op = _crc_shift_operator()                 # shift by 1 zero bit
    op = _gf2_matrix_square(op)                # 2 bits
    op = _gf2_matrix_square(op)                # 4 bits
    op = _gf2_matrix_square(op)                # 8 bits = 1 zero byte
    n = len2
    shifted_basis = [1 << i for i in range(32)]
    while n:
        if n & 1:
            shifted_basis = [_gf2_matrix_times(op, v)
                             for v in shifted_basis]
        n >>= 1
        if n:
            op = _gf2_matrix_square(op)
    return tuple(shifted_basis)


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC of concatenated streams given the two CRCs and the 2nd length.

    Appending len2 zero bytes to stream 1 shifts its CRC by the 8*len2-bit
    zero operator (square-and-multiply, cached per len2)."""
    if len2 <= 0:
        return crc1 & 0xFFFFFFFF
    cols = _crc_shift_cols(len2)
    y = 0
    i = 0
    while crc1:
        if crc1 & 1:
            y ^= cols[i]
        crc1 >>= 1
        i += 1
    return (y ^ crc2) & 0xFFFFFFFF


def adler32_combine(ad1: int, ad2: int, len2: int) -> int:
    """Adler32 of concatenated streams."""
    rem = len2 % ADLER_MOD
    s1_1, s2_1 = ad1 & 0xFFFF, (ad1 >> 16) & 0xFFFF
    s1_2, s2_2 = ad2 & 0xFFFF, (ad2 >> 16) & 0xFFFF
    s1 = (s1_1 + s1_2 - 1) % ADLER_MOD
    s2 = (s2_1 + s2_2 + rem * (s1_1 - 1)) % ADLER_MOD
    return ((s2 << 16) | s1) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# CRC32 tables for slicing-by-N device kernels
# ---------------------------------------------------------------------------

def _crc_base_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(CRC_POLY), t >> 1)
    return t


CRC_TABLE = _crc_base_table()


def _crc_slice_tables(n: int) -> np.ndarray:
    """tables[k][b] = CRC contribution of byte b followed by k zero bytes."""
    tabs = np.zeros((n, 256), dtype=np.uint32)
    tabs[0] = CRC_TABLE
    for k in range(1, n):
        prev = tabs[k - 1]
        tabs[k] = (prev >> 8) ^ CRC_TABLE[prev & 0xFF]
    return tabs


CRC_SLICE16 = _crc_slice_tables(16)


def crc32_np(data: np.ndarray, value: int = 0) -> int:
    """Lane-parallel numpy CRC (mirrors the TPU kernel structure): split into
    L lanes, run slicing-by-16 per lane, combine lanes with the shift
    operator.  Used to validate the device formulation against zlib."""
    data = np.asarray(data, dtype=np.uint8)
    n = data.size
    if n == 0:
        return value & 0xFFFFFFFF
    lanes = min(64, max(1, n // 64))
    per = -(-n // lanes)
    per = ((per + 15) // 16) * 16
    padded = np.zeros(lanes * per, dtype=np.uint8)
    padded[:n] = data
    lanes_data = padded.reshape(lanes, per)
    crcs = np.full(lanes, 0xFFFFFFFF, dtype=np.uint32)
    # crc with init 0xFFFFFFFF and no final xor, per lane
    for i in range(0, per, 16):
        chunk = lanes_data[:, i:i + 16].astype(np.uint32)
        c = crcs
        # fold the running CRC into the first 4 bytes
        b = chunk.copy()
        b[:, 0] ^= c & 0xFF
        b[:, 1] ^= (c >> 8) & 0xFF
        b[:, 2] ^= (c >> 16) & 0xFF
        b[:, 3] ^= (c >> 24) & 0xFF
        acc = np.zeros(lanes, dtype=np.uint32)
        for k in range(16):
            acc ^= CRC_SLICE16[15 - k][b[:, k]]
        crcs = acc
    # Each lane now holds crc(lane_bytes) with init 0xFFFFFFFF, no final xor.
    # Convert to standard crc32 of that lane: xor-out and account for init.
    out = value & 0xFFFFFFFF
    lane_lens = [min(per, max(0, n - li * per)) for li in range(lanes)]
    for li in range(lanes):
        ll = lane_lens[li]
        if ll == 0:
            continue
        if ll == per:
            lane_crc = int(crcs[li] ^ 0xFFFFFFFF)
        else:  # tail lane had zero padding; recompute exactly on host
            start = li * per
            lane_crc = zlib.crc32(data[start:start + ll].tobytes())
        out = crc32_combine(out, lane_crc, ll)
    return out & 0xFFFFFFFF


def adler32_np(data: np.ndarray, value: int = 1) -> int:
    """Fully-parallel Adler32 (two modular reductions), numpy mirror of the
    device kernel."""
    data = np.asarray(data, dtype=np.uint8)
    n = data.size
    s1 = value & 0xFFFF
    s2 = (value >> 16) & 0xFFFF
    if n == 0:
        return ((s2 << 16) | s1) & 0xFFFFFFFF
    d = data.astype(np.int64)
    # chunk so per-chunk weighted sums fit in int64
    c = 1 << 16
    pad = (-n) % c
    d = np.concatenate([d, np.zeros(pad, dtype=np.int64)])
    nn = d.size
    chunks = d.reshape(-1, c)
    w = np.arange(c, 0, -1, dtype=np.int64)  # weight c..1 within chunk
    csum = chunks.sum(axis=1) % ADLER_MOD
    wsum = (chunks * w).sum(axis=1) % ADLER_MOD
    # combine chunks left to right:  s2 += c*s1 + wsum_j ; s1 += csum_j
    # closed form: s1_f = s1 + Σ csum_j; s2_f = s2 + n*s1 + Σ(wsum_j +
    #   c * Σ_{k<j} csum_k)  — but padding zeros only add weight-shift on s2
    # for *real* bytes; zeros contribute 0 to both sums, and trailing zero
    # "length" must not count.  Handle by using true n in the s1 term and
    # computing the weighted sum with weights (n - i) directly:
    k = np.arange(chunks.shape[0], dtype=np.int64)
    # position of chunk start
    # Σ_i (nn - i) d_i = Σ_j [ wsum_j + (nn - (j+1)*c) * csum_j ]  (mod m)
    total_w = (wsum + ((nn - (k + 1) * c) % ADLER_MOD) * csum).sum() % ADLER_MOD
    total_c = csum.sum() % ADLER_MOD
    # Adjust from weights (nn - i) to (n - i): subtract pad * d_i sum
    total_w = (total_w - (pad % ADLER_MOD) * total_c) % ADLER_MOD
    s1_f = (s1 + total_c) % ADLER_MOD
    s2_f = (s2 + (n % ADLER_MOD) * s1 + total_w) % ADLER_MOD
    return ((int(s2_f) << 16) | int(s1_f)) & 0xFFFFFFFF
