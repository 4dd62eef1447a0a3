"""Device CRC32 / Adler32 — gather-free GF(2) formulation.

TPU gathers scalarize (~3.7 ns/element), so the classic slicing-by-16
table method is slow on device.  Instead the CRC register update is
treated as what it is — a linear map over GF(2)^32:

    crc' = L4(crc ^ word)          (consume 4 data bytes)

where L4 is the "advance register by 4 zero bytes" matrix.  Applying a
32x32 GF(2) matrix to a vector register is 32 lane-wide select+XOR ops
(one per input bit), fully vectorized across lanes — no gathers.  A
shard is split into LANES equal byte streams, each lane folds its bytes
serially (S / LANES / 4 steps), and the per-lane registers tree-combine
in log2(LANES) rounds using precomputed zero-shift matrices.

Adler32 is two modular sums — chunked so every partial product fits in
uint32 (TPU has no int64).

Reference equivalent: std.hash.Crc32/Adler32 rolled inline with I/O
(container.zig:168-206).  Host oracle: CPython zlib (= madler/zlib).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..checksums import ADLER_MOD, CRC_TABLE, crc32_combine

LANES = 256


# ---------------------------------------------------------------------------
# host-side GF(2) matrix precomputation
# ---------------------------------------------------------------------------

def _advance_zero_bytes(state: int, k: int) -> int:
    for _ in range(k):
        state = (state >> 8) ^ int(CRC_TABLE[state & 0xFF])
    return state


@functools.lru_cache(maxsize=None)
def _cols_zero_bytes(k: int) -> np.ndarray:
    """(32,) u32: column i = register (1 << i) advanced by k zero bytes."""
    return np.asarray([_advance_zero_bytes(1 << i, k) for i in range(32)],
                      dtype=np.uint32)


def _apply_cols(cols: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = M @ x over GF(2); cols (32,) u32, x (...,) u32 vectorized."""
    y = jnp.zeros_like(x)
    for i in range(32):
        bit = (x >> jnp.uint32(i)) & jnp.uint32(1)
        y = y ^ (jnp.uint32(0) - bit) & cols[i]
    return y


# ---------------------------------------------------------------------------
# CRC32 of full (padded) rows + host fixup for ragged tails
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _crc32_rows_padded(rows: jnp.ndarray) -> jnp.ndarray:
    """rows (B, S) u8, S % (4 * LANES) == 0 -> (B,) u32 standard crc32
    of each full row (init 0xFFFFFFFF, xorout)."""
    B, S = rows.shape
    per = S // LANES                       # bytes per lane
    nw = per // 4                          # u32 words per lane
    b = rows.reshape(B, LANES, nw, 4).astype(jnp.uint32)
    words = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
             | (b[..., 3] << 24))          # (B, LANES, nw) LE words

    l4 = jnp.asarray(_cols_zero_bytes(4))

    def step(crc, w):
        return _apply_cols(l4, crc ^ w), None

    init = jnp.full((B, LANES), 0xFFFFFFFF, jnp.uint32)
    crc, _ = jax.lax.scan(step, init,
                          jnp.moveaxis(words, 2, 0))
    crc = crc ^ jnp.uint32(0xFFFFFFFF)     # per-lane standard crc32

    # adjacent-pair tree combine on finalized values (zlib identity:
    # crc(A||B) = Mlen(B)(crc(A)) ^ crc(B); crc32_combine(x, 0, k) is
    # linear in x, so the operator matrix columns come straight from it)
    seg = per                              # bytes covered per register
    cnt = LANES
    while cnt > 1:
        cols = jnp.asarray(_cols_zero_bytes_final(seg))
        pairs = crc.reshape(B, cnt // 2, 2)
        crc = _apply_cols(cols, pairs[:, :, 0]) ^ pairs[:, :, 1]
        seg *= 2
        cnt //= 2
    return crc[:, 0]


@functools.partial(jax.jit, static_argnames=())
def _crc32_rows_any(rows: jnp.ndarray) -> jnp.ndarray:
    """_crc32_rows_padded with in-jit zero-pad to a 4*LANES multiple.
    Callers must fix up with crc32_fixup against the PADDED width
    (shape[1] rounded up)."""
    pad = (-rows.shape[1]) % (4 * LANES)
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return _crc32_rows_padded(rows)


def padded_width(S: int) -> int:
    """Row width _crc32_rows_any actually hashes (for crc32_fixup)."""
    return S + ((-S) % (4 * LANES))


@functools.lru_cache(maxsize=None)
def _cols_zero_bytes_final(k: int) -> np.ndarray:
    """Operator matching crc32_combine: finalized-crc shift by k zero
    bytes (columns = combine(1 << i, 0, k) ^ combine(0, 0, k) over the
    linear part; crc32_combine(x, 0, k) is linear in x)."""
    z = crc32_combine(0, 0, k)
    return np.asarray(
        [crc32_combine(1 << i, 0, k) ^ z for i in range(32)],
        dtype=np.uint32)


def crc32_fixup(full: np.ndarray, lens: np.ndarray, S: int) -> np.ndarray:
    """Host fixup: per-row crc of the FULL zero-padded row -> crc of the
    first lens[b] bytes (inverts the pad-zeros shift; O(1) matrix op per
    ragged row, full rows pass through)."""
    full = np.asarray(full, dtype=np.uint32)
    lens = np.asarray(lens, dtype=np.int64)
    out = np.zeros(full.shape[0], dtype=np.uint32)
    for b in range(full.shape[0]):
        p = int(S - lens[b])
        if p == 0:
            out[b] = full[b]
        else:
            # invert the p-zero-byte shift: full = M c ^ z  =>  c = M^-1(full^z)
            out[b] = _unshift_final(int(full[b]), p)
    return out


def crc32_shards(rows: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(B, S) u8 + per-row valid lengths -> (B,) u32 standard crc32 of
    each row's first lens[b] bytes.  Rows must be zero-padded; S must be
    a multiple of 4*LANES.  Device does the O(n) work; ragged tails get
    an O(log pad) host fixup (crc(d || zeros_p) -> crc(d))."""
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    B, S = rows.shape
    full = np.asarray(_crc32_rows_padded(jnp.asarray(rows)))
    return crc32_fixup(full, lens, S)


@functools.lru_cache(maxsize=None)
def _inv_cols_final(p: int) -> np.ndarray:
    """Inverse of the finalized-crc p-zero-byte shift matrix (GF(2))."""
    cols = _cols_zero_bytes_final(p)
    # Gaussian elimination over GF(2) on the 32x32 bit matrix
    m = np.zeros((32, 32), dtype=np.uint8)
    for i in range(32):
        for j in range(32):
            m[j, i] = (int(cols[i]) >> j) & 1
    aug = np.concatenate([m, np.eye(32, dtype=np.uint8)], axis=1)
    for c in range(32):
        piv = next(r for r in range(c, 32) if aug[r, c])
        aug[[c, piv]] = aug[[piv, c]]
        for r in range(32):
            if r != c and aug[r, c]:
                aug[r] ^= aug[c]
    inv = aug[:, 32:]
    return np.asarray(
        [int("".join(map(str, inv[::-1, i])), 2) for i in range(32)],
        dtype=np.uint32)


def _unshift_final(crc_padded: int, p: int) -> int:
    import zlib
    z = zlib.crc32(b"\x00" * p) & 0xFFFFFFFF   # crc(zeros_p), finalized
    x = crc_padded ^ z
    cols = _inv_cols_final(p)
    y = 0
    for i in range(32):
        if (x >> i) & 1:
            y ^= int(cols[i])
    return y & 0xFFFFFFFF


def crc32_device(data: bytes | np.ndarray) -> int:
    """Whole-buffer device CRC32 (single logical stream)."""
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes,
                                                             bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.size
    if n == 0:
        return 0
    S = 4 * LANES
    rows_n = -(-n // S)
    padded = np.zeros(rows_n * S, np.uint8)
    padded[:n] = arr
    # single row of rows_n*S bytes? keep (1, N) shape with S mult check
    total = rows_n * S
    crc = crc32_shards(padded.reshape(1, total),
                       np.asarray([n], np.int64))
    return int(crc[0])


# ---------------------------------------------------------------------------
# Adler32
# ---------------------------------------------------------------------------

CHUNK = 2048          # 2048*2048*255 < 2^30; chunk partial sums fit u32


@functools.partial(jax.jit, static_argnames=())
def _adler_rows(rows: jnp.ndarray, lens: jnp.ndarray):
    """(B, S) u8 zero-padded + (B,) lens -> (s1, s2) (B,) u32 (no init)."""
    B, S = rows.shape
    assert S % CHUNK == 0
    d = rows.astype(jnp.uint32)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    live = pos < lens[:, None]
    d = jnp.where(live, d, 0)
    ch = d.reshape(B, S // CHUNK, CHUNK)
    # inner weights: (chunk_end - i) for i in chunk = CHUNK - k
    wk = jnp.arange(CHUNK, 0, -1, dtype=jnp.uint32)[None, None, :]
    csum = jnp.sum(ch, axis=2) % ADLER_MOD                  # (B, NC)
    wsum = jnp.sum(ch * wk, axis=2) % ADLER_MOD             # (B, NC)
    # outer: Σ_i (len - i) d_i = Σ_j [ wsum_j + (len - end_j) * csum_j ]
    nc = S // CHUNK
    ends = (jnp.arange(nc, dtype=jnp.int32)[None, :] + 1) * CHUNK
    outer = (lens[:, None] - ends) % ADLER_MOD
    outer = outer.astype(jnp.uint32)
    terms = (wsum + outer * csum) % ADLER_MOD
    s2 = jnp.sum(terms, axis=1) % ADLER_MOD
    s1 = jnp.sum(csum, axis=1) % ADLER_MOD
    return s1, s2


@functools.partial(jax.jit, static_argnames=())
def _adler_rows_any(rows: jnp.ndarray, lens: jnp.ndarray):
    """_adler_rows with in-jit zero-pad to a CHUNK multiple."""
    pad = (-rows.shape[1]) % CHUNK
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return _adler_rows(rows, lens.astype(jnp.int32))


def adler_finalize(s1: np.ndarray, s2: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Fold the standard init (s1 starts at 1) into raw device sums."""
    lens = np.asarray(lens, dtype=np.int64)
    s1 = (np.asarray(s1).astype(np.int64) + 1) % ADLER_MOD
    s2 = (np.asarray(s2).astype(np.int64) + lens % ADLER_MOD) % ADLER_MOD
    return ((s2 << 16) | s1).astype(np.uint32)


def adler32_shards(rows: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(B, S) u8 zero-padded -> (B,) u32 standard adler32 per row."""
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    s1, s2 = _adler_rows_any(jnp.asarray(rows),
                             jnp.asarray(lens, np.int32))
    return adler_finalize(s1, s2, lens)


def adler32_device(data: bytes | np.ndarray) -> int:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes,
                                                             bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.size
    if n == 0:
        return 1
    return int(adler32_shards(arr.reshape(1, n),
                              np.asarray([n], np.int64))[0])
