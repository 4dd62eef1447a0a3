"""Device-side dynamic-block header construction — vectorized codegen RLE.

Builds, for a whole batch of shards at once, the (value, nbits) field
sequence of a DEFLATE dynamic block header: HLIT/HDIST/HCLEN, the
codegen code lengths in CODEGEN_ORDER, and the RLE items (RFC 1951
§3.2.7 codes 0-15/16/17/18 with extras) coding the literal/length and
distance code lengths.  Replaces the per-shard host Python
(jx/pipeline._dynamic_header_fields) so planning stays on device.

The RLE is position-parallel: every position of the 316-length sequence
knows its run start/length/offset (via cumulative max/min scans) and
decides arithmetically whether it emits an item and which.  Runs never
cross the hlit boundary (section id is part of the run key) — the
strict-decoder requirement pinned by tests/test_roundtrip.py.

Reference: block_writer.zig:78-171 (generateCodegen), :237-281
(dynamicHeader).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from . import huff

SEQ = consts.NUM_LITLEN + consts.NUM_DIST          # 316
HDR_SLOTS = 23 + 2 * SEQ                           # 655
_ORDER = np.asarray(consts.CODEGEN_ORDER, dtype=np.int32)
# inverse permutation: position of symbol s in CODEGEN_ORDER
_ORDER_INV = np.zeros(consts.NUM_CODEGEN, dtype=np.int32)
_ORDER_INV[_ORDER] = np.arange(consts.NUM_CODEGEN)

BIG = np.int32(1 << 20)  # np, not jnp: no backend init at import


def _cummax(x, axis):
    # saturating static-shift doubling instead of lax.associative_scan:
    # the latter miscompiles on the real TPU backend (see memory/
    # axon-tpu-quirks and the equivalent loops in jx/match.py, runs.py)
    assert axis == 1
    n = x.shape[1]
    s = 1
    while s < n:
        pad = jnp.full_like(x[:, :s], -BIG)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:, :-s]], axis=1))
        s *= 2
    return x


def _cummin_rev(x, axis):
    assert axis == 1
    n = x.shape[1]
    s = 1
    while s < n:
        pad = jnp.full_like(x[:, :s], BIG)
        x = jnp.minimum(x, jnp.concatenate([x[:, s:], pad], axis=1))
        s *= 2
    return x


def _rle_emit(v: jnp.ndarray, live: jnp.ndarray):
    """Position-parallel codegen RLE over (B, SEQ) values.

    v: code length 0..15 per position; live: mask (dead positions break
    runs and emit nothing).  Returns (sym, extra_val, extra_bits,
    emit_mask), all (B, SEQ)."""
    B, n = v.shape
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    sec = (idx >= consts.NUM_LITLEN).astype(jnp.int32)
    key = jnp.where(live, v + 16 * sec, -1 - idx)   # dead: unique key
    prev = jnp.concatenate([jnp.full((B, 1), -99, jnp.int32), key[:, :-1]],
                           axis=1)
    bnd = key != prev
    start = _cummax(jnp.where(bnd, idx, -1), axis=1)
    nxt_b = jnp.concatenate([
        _cummin_rev(jnp.where(bnd, idx, BIG), axis=1)[:, 1:],
        jnp.full((B, 1), BIG, jnp.int32)], axis=1)
    end = jnp.minimum(nxt_b, n)
    r = end - start                                  # run length
    o = idx - start                                  # offset within run

    is_zero = v == 0
    # zero runs: chunks of 18s, then 17 or literal zeros
    q = r // 138
    s = r - 138 * q
    c18 = q + (s >= 11).astype(jnp.int32)
    tail = jnp.where(s >= 11, 0, s)                  # leftover after 18s
    chunk = o // 138
    at_chunk = (o % 138 == 0) & (chunk < c18)
    sz18 = jnp.minimum(138, r - o)
    z_tail_start = 138 * q + jnp.where(s >= 11, s, 0)
    emit17 = (tail >= 3) & (o == z_tail_start)
    lit0 = (tail < 3) & (o >= z_tail_start)

    # nonzero runs: literal first, chunks of 16s, then literal leftovers
    rem = r - 1
    q2 = rem // 6
    s2 = rem - 6 * q2
    c16 = q2 + (s2 >= 3).astype(jnp.int32)
    tail2 = jnp.where(s2 >= 3, 0, s2)
    o2 = o - 1
    at16 = (o >= 1) & (o2 % 6 == 0) & (o2 // 6 < c16)
    sz16 = jnp.minimum(6, r - o)
    nz_tail_start = 1 + 6 * q2 + jnp.where(s2 >= 3, s2, 0)
    litv = (o == 0) | ((tail2 > 0) & (o >= nz_tail_start))

    sym = jnp.where(
        is_zero,
        jnp.where(at_chunk, 18, jnp.where(emit17, 17, 0)),
        jnp.where(at16, 16, v))
    ev = jnp.where(
        is_zero,
        jnp.where(at_chunk, sz18 - 11, jnp.where(emit17, tail - 3, 0)),
        jnp.where(at16, sz16 - 3, 0))
    eb = jnp.where(
        is_zero,
        jnp.where(at_chunk, 7, jnp.where(emit17, 3, 0)),
        jnp.where(at16, 2, 0))
    emit = live & jnp.where(is_zero, at_chunk | emit17 | lit0,
                            at16 | litv)
    return sym, ev, eb, emit


@functools.partial(jax.jit, static_argnames=())
def build_headers(ll_lens: jnp.ndarray, d_lens: jnp.ndarray,
                  final: jnp.ndarray):
    """Dynamic-header fields for a batch.

    ll_lens (B, 286), d_lens (B, 30) int32; final (B,) bool/int.
    Returns (vals (B, HDR_SLOTS) uint32, bits (B, HDR_SLOTS) int32,
    total_bits (B,) int32)."""
    B = ll_lens.shape[0]
    ll_lens = ll_lens.astype(jnp.int32)
    d_lens = d_lens.astype(jnp.int32)
    iL = jnp.arange(consts.NUM_LITLEN, dtype=jnp.int32)[None, :]
    iD = jnp.arange(consts.NUM_DIST, dtype=jnp.int32)[None, :]
    hlit = jnp.maximum(257, jnp.max(jnp.where(ll_lens > 0, iL + 1, 0), axis=1))
    hdist = jnp.maximum(1, jnp.max(jnp.where(d_lens > 0, iD + 1, 0), axis=1))

    v = jnp.concatenate([ll_lens, d_lens], axis=1)           # (B, SEQ)
    idx = jnp.arange(SEQ, dtype=jnp.int32)[None, :]
    live = jnp.where(idx < consts.NUM_LITLEN,
                     idx < hlit[:, None],
                     (idx - consts.NUM_LITLEN) < hdist[:, None])
    sym, ev, eb, emit = _rle_emit(v, live)

    # codegen alphabet frequencies via one-hot sum (19 symbols)
    oh = (sym[:, :, None] == jnp.arange(consts.NUM_CODEGEN,
                                        dtype=jnp.int32)[None, None, :])
    cg_freq = jnp.sum(oh & emit[:, :, None], axis=1).astype(jnp.int32)
    cg_lens = huff.pm_lengths(cg_freq, consts.MAX_CODEGEN_BITS)
    cg_codes = huff.canonical_codes_dev(cg_lens, consts.MAX_CODEGEN_BITS)

    order = jnp.asarray(_ORDER)
    ordered = cg_lens[:, order]                              # (B, 19)
    iO = jnp.arange(consts.NUM_CODEGEN, dtype=jnp.int32)[None, :]
    hclen = jnp.maximum(4, jnp.max(jnp.where(ordered > 0, iO + 1, 0), axis=1))

    item_code = jnp.take_along_axis(cg_codes, sym, axis=1)
    item_clen = jnp.take_along_axis(cg_lens, sym, axis=1)

    head_vals = jnp.stack([
        final.astype(jnp.int32) | (2 << 1),
        hlit - 257, hdist - 1, hclen - 4], axis=1).astype(jnp.uint32)
    head_bits = jnp.broadcast_to(
        jnp.asarray([3, 5, 5, 4], jnp.int32)[None, :], (B, 4))
    cl_vals = ordered.astype(jnp.uint32)
    cl_bits = jnp.where(iO < hclen[:, None], 3, 0)
    item_vals = jnp.stack(
        [item_code, ev.astype(jnp.uint32)], axis=2).reshape(B, 2 * SEQ)
    item_bits = jnp.where(
        emit[:, :, None],
        jnp.stack([item_clen, eb], axis=2), 0).reshape(B, 2 * SEQ)

    vals = jnp.concatenate([head_vals, cl_vals, item_vals], axis=1)
    bits = jnp.concatenate([head_bits, cl_bits, item_bits], axis=1)
    return vals.astype(jnp.uint32), bits.astype(jnp.int32), \
        jnp.sum(bits, axis=1)
