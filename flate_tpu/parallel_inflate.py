"""Speculative parallel inflate — numpy specification of the TPU decoder.

The decode hot loop is serially dependent on the bit position
(inflate.zig:220-239).  This module re-derives it as three data-parallel
passes, the plan the round-2 Pallas/XLA decoder implements
(rapidgzip-style speculation + massively-parallel LZ resolution, see
PAPERS.md):

1. **Speculative symbol decode at every bit offset.**  For each bit
   position p of a block body, decode ONE symbol as if a symbol started
   at p: flat-table litlen lookup, then (for matches) length extra bits,
   distance code, distance extra bits — all reads index one precomputed
   per-position 15-bit window array, so the whole pass is table gathers +
   arithmetic with no sequential state.  Yields per-position symbol info
   and the bit advance next[p] (a functional graph over bit positions).

2. **Boundary extraction by pointer doubling.**  The true symbol sequence
   is the orbit of bit offset 0 through next[]; log2(n) doubling rounds
   mark every true symbol start (the same machinery as the encoder's
   parse).  Speculative lanes at wrong offsets are never visited, so
   their garbage (even invalid codes) is harmless.

3. **Parallel LZ77 resolution.**  An exclusive scan over per-symbol
   output lengths gives every symbol its output span; literals scatter
   directly, match copies resolve in passes (each pass copies bytes whose
   source is already final; overlap chains double their resolved prefix
   every pass, so passes are logarithmic in practice).

This host implementation is the correctness oracle for the device port;
tests decode real zlib-produced blocks through it.
"""

from __future__ import annotations

import numpy as np

from . import tables
from .errors import InvalidCode, InvalidMatch

_SLACK = 64  # max chained field bits after a litlen code (5+15+13 < 64)


def _bit_windows(data: np.ndarray, start_bit: int, n: int) -> np.ndarray:
    """w[i] = 15 bits (LSB-first) at bit position start_bit + i for
    i in [0, n), zero-padded past the end of data."""
    b = np.concatenate([data, np.zeros(16, np.uint8)]).astype(np.uint32)
    dword = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    bitpos = start_bit + np.arange(n, dtype=np.int64)
    byte = bitpos >> 3
    sh = (bitpos & 7).astype(np.uint32)
    return (dword[byte] >> sh) & 0x7FFF


def decode_block_parallel(data: bytes, start_bit: int, ll_table, d_table
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                     int]:
    """Passes 1+2 for one coded block body.

    ll_table/d_table: flat 15-bit decode tables (inflate.build_decode_table).
    Returns (kinds, values, dists, end_bit) over the true symbol sequence
    (EOB excluded): kinds 0=literal (values=byte), 1=match (values=length,
    dists=distance).
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(data) * 8 - start_bit
    if n <= 0:
        raise InvalidCode("empty block body")
    ll_sym, ll_bits = ll_table
    d_sym, d_bits = d_table

    win = _bit_windows(arr, start_bit, n + _SLACK)
    idx = np.arange(n, dtype=np.int64)

    s = ll_sym[win[idx]].astype(np.int64)
    sbits = ll_bits[win[idx]].astype(np.int64)
    bad = s < 0

    is_m = s > 256
    li = np.clip(s - 257, 0, 28)
    bad |= is_m & (s - 257 > 28)
    leb = np.where(is_m, tables.LENGTH_EXTRA_BITS[li], 0)
    o1 = idx + sbits
    lev = win[o1] & ((1 << leb) - 1)
    length = tables.LENGTH_BASE[li] + lev

    o2 = o1 + leb
    ds = np.where(is_m, d_sym[win[o2]].astype(np.int64), 0)
    bad |= is_m & ((ds < 0) | (ds > 29))
    ds = np.clip(ds, 0, 29)
    dbits = np.where(is_m, d_bits[win[o2]].astype(np.int64), 0)
    o3 = o2 + dbits
    deb = np.where(is_m, tables.DIST_EXTRA_BITS[ds], 0)
    dev = win[o3] & ((1 << deb) - 1)
    dist = tables.DIST_BASE[ds] + dev

    advance = np.where(is_m, o3 + deb - idx, sbits)
    advance = np.where(s == 256, n - idx, advance)      # EOB terminates
    advance = np.maximum(advance, 1)                    # bad lanes still move

    # pass 2: orbit of offset 0 via pointer doubling
    nxt = np.minimum(idx + advance, n)
    on = np.zeros(n + 1, dtype=bool)
    on[0] = True
    jump = np.concatenate([nxt, [n]])
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))))):
        np.maximum.at(on, jump[np.flatnonzero(on[:-1])], True)
        jump = jump[jump]

    path = np.flatnonzero(on[:n])
    if bad[path].any():
        raise InvalidCode("invalid code on the true decode path")
    eob_hits = np.flatnonzero(s[path] == 256)
    if eob_hits.size == 0:
        from .errors import EndOfStream
        raise EndOfStream("no end-of-block before the body ran out")
    eob_pos = int(path[eob_hits[0]])
    path = path[:eob_hits[0]]
    end_bit = start_bit + eob_pos + int(sbits[eob_pos])

    kinds = is_m[path].astype(np.int8)
    values = np.where(is_m[path], length[path], s[path]).astype(np.int64)
    dists = np.where(is_m[path], dist[path], 0).astype(np.int64)
    return kinds, values, dists, end_bit


def resolve_lz(kinds: np.ndarray, values: np.ndarray, dists: np.ndarray,
               history: bytes = b"") -> bytes:
    """Pass 3: materialize the output from the symbol stream.

    history: preceding decoded bytes back-references may reach into
    (context priming / earlier blocks)."""
    out_lens = np.where(kinds == 1, values, 1)
    ends = np.cumsum(out_lens)
    offs = ends - out_lens
    h = len(history)
    total = h + (int(ends[-1]) if ends.size else 0)
    out = np.zeros(total, dtype=np.uint8)
    resolved = np.zeros(total, dtype=bool)
    if h:
        out[:h] = np.frombuffer(history, dtype=np.uint8)
        resolved[:h] = True

    lit = kinds == 0
    out[h + offs[lit]] = values[lit]
    resolved[h + offs[lit]] = True

    m = np.flatnonzero(kinds == 1)
    if m.size:
        mlen = values[m]
        # per-byte destination/source arrays (ragged ranges flattened)
        reps = mlen
        k = (np.arange(int(reps.sum())) -
             np.repeat(np.cumsum(reps) - reps, reps))
        dstb = h + np.repeat(offs[m], reps) + k
        # overlapping copies (dist < len) replicate with period dist:
        # out[start + k] == out[start - dist + (k mod dist)], whose source
        # always PRECEDES the match start
        db = np.repeat(dists[m], reps)
        srcb = h + np.repeat(offs[m], reps) - db + (k % db)
        if (srcb < 0).any():
            raise InvalidMatch("distance reaches before the stream start")
        # byte-level source map + pointer doubling: every byte points at
        # its copy source (literals/history point at themselves); log2
        # rounds of P = P[P] land every pointer on a terminal literal.
        # This is the massively-parallel LZ resolution of the round-2
        # device decoder (PAPERS.md) — no chain is followed sequentially.
        P = np.arange(total, dtype=np.int64)
        P[dstb] = srcb
        rounds = max(1, int(np.ceil(np.log2(max(total, 2)))))
        for _ in range(rounds):
            P = P[P]
        if not resolved[P].all():
            raise InvalidMatch("copy chain does not terminate in a literal")
        out = out[P]
    return out[h:].tobytes()
