"""Device optimal-parse squeeze — block-local backward cost DP.

The host path runs a zopfli-style shortest-path parse in C
(native/fastparse.c) that beats zlib at levels 7-9.  This is its
TPU-native counterpart: within each parse block (no token crosses block
boundaries — same contract as jx/parse.parse_blocks), a backward DP
picks, per position, the cheapest of {literal, match at one of a coarse
length grid}: cost[i] = min(lit_bits[i] + cost[i+1],
                            min_l match_bits(l, d_i) + cost[i + l]).

All blocks run as vector lanes; cost[i + l] reads come from a sliding
(L, WIN) window of future costs via one-hot masks over the 264-wide
window, so no gathers.  Bit costs come from a first greedy pass's
Huffman tables — one squeeze iteration, like the reference's two-pass
flow (block_writer.zig builds codes from the actual histogram).

The coarse grid {3,4,5,6,8,12,16,24,32,48,64,96,128,192,258} ∩ [3,
mlen] trades exactness for vectorizability; measured recovery is most
of the full DP's gain (short-match economization dominates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from . import encode as enc
from . import onehot

GRID = (3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 258)
WIN = 264                     # sliding future-cost window (>= 258 + 1)
BIG = np.int32(1 << 28)  # np, not jnp: no backend init at import


def _match_bits(l: jnp.ndarray, d: jnp.ndarray, ll_bits: jnp.ndarray,
                d_bits: jnp.ndarray) -> jnp.ndarray:
    """Exact coded size of a (l, d) match under per-row tables.

    l, d: (B, S); ll_bits (B, 286), d_bits (B, 30) code lengths."""
    lc = enc.length_code(jnp.maximum(l, 3))
    _, leb = enc.length_extra(jnp.maximum(l, 3), lc)
    lbits = onehot.lookup_onehot(ll_bits.astype(jnp.uint32),
                                 257 + lc).astype(jnp.int32)
    return lbits + leb + _dist_cost(d, d_bits)


def _dist_cost(d: jnp.ndarray, d_bits: jnp.ndarray) -> jnp.ndarray:
    dc = enc.dist_code(jnp.maximum(d, 1))
    _, deb = enc.dist_extra(jnp.maximum(d, 1), dc)
    dbits = onehot.lookup_onehot(d_bits.astype(jnp.uint32),
                                 dc).astype(jnp.int32)
    return dbits + deb


def _length_code_py(length: int) -> tuple[int, int]:
    """(code, extra_bits) for a compile-time length — host arithmetic
    so constant grid lengths never trace a table lookup."""
    n = length - 3
    if n == 255:
        return 28, 0
    if n < 8:
        return n, 0
    e = max(n.bit_length() - 1 - 2, 1)
    code = (e << 2) + (n >> e)
    return code, (code >> 2) - 1


@functools.partial(jax.jit, static_argnames=("blk", "grid_only"))
def squeeze_parse(window_tail: jnp.ndarray, mlen: jnp.ndarray,
                  mdist: jnp.ndarray, ll_bits: jnp.ndarray,
                  d_bits: jnp.ndarray, blk: int = 1024,
                  grid_only: bool = False):
    """Cost-optimal (take, starts, sel_len) over the shard region.

    window_tail/mlen/mdist: (B, S) shard-region arrays (matches already
    truncated to parse blocks); ll_bits/d_bits: per-row code lengths
    from the greedy pass.  Returns (take, starts, sel_len) — sel_len is
    the chosen token length per start (literal = 1)."""
    B, S = window_tail.shape
    assert S % blk == 0
    NB = S // blk
    L = B * NB

    lit_bits = onehot.lookup_onehot(
        ll_bits.astype(jnp.uint32), window_tail.astype(jnp.int32)
    ).astype(jnp.int32)
    lit_bits = jnp.where(lit_bits == 0, 15, lit_bits)   # unseen byte guard

    # Option set: the full match length (dynamic, one one-hot window
    # read) plus static grid lengths g < mlen (static column reads —
    # GRID values are compile-time constants, so cost_win[:, g-1] costs
    # nothing; ~15x cheaper than one-hot reads per option).
    # grid_only drops the dynamic full-length option (matches quantize
    # DOWN to the nearest grid length; the tail re-parses, usually as a
    # same-distance continuation) — every DP read becomes a dynamic-
    # scalar column slice instead of a per-lane one-hot over the whole
    # (L, WIN) ring.
    dcost = _dist_cost(mdist, d_bits)         # shared by every option
    if grid_only:
        full_l = jnp.zeros_like(mlen)
        full_c = jnp.full_like(mlen, BIG)
        sgrid = GRID                          # incl. 258
    else:
        full_l = jnp.where(mlen >= consts.MIN_MATCH_LEN, mlen, 0)
        lc = enc.length_code(jnp.maximum(mlen, 3))
        _, leb = enc.length_extra(jnp.maximum(mlen, 3), lc)
        lbits = onehot.lookup_onehot(ll_bits.astype(jnp.uint32),
                                     257 + lc).astype(jnp.int32)
        full_c = jnp.where(mlen >= consts.MIN_MATCH_LEN,
                           lbits + leb + dcost, BIG)
        sgrid = GRID[:-1]                     # 258 comes via full_l
    static_c = []
    for g in sgrid:
        okay = (mlen >= g) if grid_only else (mlen > g)
        # constant grid length: code/extra on host, the per-row code
        # length is one table COLUMN — no lookup loop per grid point
        gc, geb = _length_code_py(g)
        cost = ll_bits[:, 257 + gc].astype(jnp.int32)[:, None] \
            + geb + dcost
        static_c.append(jnp.where(okay, cost, BIG))

    def to_lanes(x):
        return x.reshape(B, NB, blk).reshape(L, blk)

    lit_l = to_lanes(lit_bits)
    fl = to_lanes(full_l)
    fc = to_lanes(full_c)
    sc = jnp.stack([to_lanes(x) for x in static_c], 0)   # (O-1, L, blk)

    lane_iota = jnp.arange(WIN, dtype=jnp.int32)[None, :]

    # The window of future costs is a RING (head h = slot of cost[i+1]):
    # the naive sliding concat copies the full (L, WIN) window every
    # step (~4 GB of HBM traffic per 4 MiB batch); the ring writes one
    # column.  U steps run inline per loop iteration to amortize the
    # XLA while-loop overhead (the DP is latency-, not work-bound).
    U = int(_os.environ.get("FLATE_TPU_SQUEEZE_U", "8"))
    assert blk % U == 0

    def step(i, h, cost_ring, sel):
        # slot of cost[i + 1 + r] = (h + r) % WIN
        best = lit_l[:, i] + jax.lax.dynamic_slice(
            cost_ring, (0, h), (L, 1))[:, 0]
        bl = jnp.ones((L,), jnp.int32)
        if not grid_only:
            l = fl[:, i]
            slot = jax.lax.rem(h + l - 1, WIN)
            c = fc[:, i] + jnp.sum(
                jnp.where(lane_iota == slot[:, None], cost_ring, 0),
                axis=1)
            c = jnp.where(l > 0, c, BIG)
            upd = c < best
            best = jnp.where(upd, c, best)
            bl = jnp.where(upd, l, bl)
        for o, g in enumerate(sgrid):
            c = sc[o, :, i] + jax.lax.dynamic_slice(
                cost_ring, (0, jax.lax.rem(h + g - 1, WIN)), (L, 1))[:, 0]
            upd = c < best
            best = jnp.where(upd, c, best)
            bl = jnp.where(upd, g, bl)
        sel = jax.lax.dynamic_update_slice(sel, bl[:, None], (0, i))
        h = jax.lax.rem(h + WIN - 1, WIN)
        cost_ring = jax.lax.dynamic_update_slice(
            cost_ring, best[:, None], (0, h))
        return h, cost_ring, sel

    def body(j, carry):
        h, cost_ring, sel = carry
        for u in range(U):
            i = blk - 1 - (j * U + u)
            h, cost_ring, sel = step(i, h, cost_ring, sel)
        return h, cost_ring, sel

    cost0 = jnp.zeros((L, WIN), jnp.int32)   # cost beyond block end = 0
    sel0 = jnp.ones((L, blk), jnp.int32)
    _, _, sel = jax.lax.fori_loop(
        0, blk // U, body, (jnp.int32(0), cost0, sel0))

    # walk each block by sel_len to produce the start mask; literal RUNS
    # are skipped in one hop (every position in the run is a start), so
    # iterations ~ matches + literal runs, not positions — the same
    # economy parse.parse_blocks uses
    from .parse import _runs_of_ones
    iota = jnp.arange(blk, dtype=jnp.int32)[None, :]
    run1 = _runs_of_ones(sel == 1, blk)

    def wcond(state):
        cur, visited = state
        return jnp.any(cur < blk)

    def wbody(state):
        cur, visited = state
        oh = iota == cur[:, None]
        s = jnp.sum(jnp.where(oh, sel, 0), axis=1)
        r = jnp.sum(jnp.where(oh, run1, 0), axis=1)
        islit = s == 1
        span = jnp.where(islit, r, 1)
        lo = cur[:, None]
        hi = (cur + span)[:, None]
        visited = visited | ((iota >= lo) & (iota < hi))
        adv = jnp.where(islit, r, jnp.maximum(s, 1))
        cur = jnp.where(cur < blk, cur + adv, cur)
        return cur, visited

    cur0 = jnp.zeros((L,), jnp.int32)
    vis0 = jnp.zeros((L, blk), jnp.bool_)
    _, starts_l = jax.lax.while_loop(wcond, wbody, (cur0, vis0))

    starts = starts_l.reshape(B, NB, blk).reshape(B, S)
    sel_pos = sel.reshape(B, NB, blk).reshape(B, S)
    take = starts & (sel_pos >= consts.MIN_MATCH_LEN)
    return take, starts, sel_pos


import os as _os

# DP-cost histogram subsampling: the cost model only RANKS parses, so
# a 1-in-N positional sample of the token histogram is size-neutral
# (r5 ablation: stride 4 = +0.04% text / -0.04% binary) while cutting
# the greedy pass's one-hot histogram work by N.  Chip A/B knob.
HIST_STRIDE = int(_os.environ.get("FLATE_TPU_SQUEEZE_HIST_STRIDE", "1"))


def greedy_code_lengths(window_tail: jnp.ndarray, mlen: jnp.ndarray,
                        mdist: jnp.ndarray, starts: jnp.ndarray,
                        take: jnp.ndarray, valid_len: jnp.ndarray,
                        exact: bool = False, stride: int = HIST_STRIDE):
    """Code lengths from the greedy pass's token histogram (the DP's
    cost model; mirrors build_fields' histogram stage).

    The DP only RANKS parses — emission builds exact tables later — so
    the default cost model is the rounded entropy estimate
    (-log2 p + 0.35, the same estimator build_fields' stored/coded
    decision uses); exact=True restores package-merge lengths.
    stride>1 samples every stride-th position into the histograms."""
    from . import huff
    B, S = window_tail.shape
    if stride > 1:
        window_tail = window_tail[:, ::stride]
        mlen, mdist = mlen[:, ::stride], mdist[:, ::stride]
        starts, take = starts[:, ::stride], take[:, ::stride]
        valid_len = -(-valid_len // stride)
        S = window_tail.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    live = pos < valid_len[:, None]
    tok_start = starts & live
    is_m = take & tok_start
    lcode = enc.length_code(jnp.maximum(mlen, 3))
    llsym = jnp.where(is_m, 257 + lcode, window_tail.astype(jnp.int32))
    llsym = jnp.where(tok_start, llsym, 0)
    dsym = jnp.where(is_m, enc.dist_code(jnp.maximum(mdist, 1)), 0)
    hll = onehot.hist_onehot(llsym, tok_start, consts.NUM_LITLEN)
    hll = hll.at[:, consts.END_OF_BLOCK].add(1)
    hdd = onehot.hist_onehot(dsym, is_m, consts.NUM_DIST)
    if exact:
        ll_lens = huff.pm_lengths(hll, consts.MAX_CODE_BITS)
        d_lens = huff.pm_lengths(hdd, consts.MAX_CODE_BITS)
    else:
        ll_lens = jnp.round(_entropy_lens(hll)).astype(jnp.int32)
        d_lens = jnp.round(_entropy_lens(hdd)).astype(jnp.int32)
    # zero-length guards: unseen symbols cost a pessimistic 15 bits
    ll_bits = jnp.where(ll_lens > 0, ll_lens, 15)
    d_bits = jnp.where(d_lens > 0, d_lens, 15)
    return ll_bits, d_bits


def _entropy_lens(h: jnp.ndarray) -> jnp.ndarray:
    total = jnp.maximum(1, h.sum(axis=1, keepdims=True)).astype(jnp.float32)
    p = h.astype(jnp.float32) / total
    bits = jnp.clip(-jnp.log2(jnp.maximum(p, 1e-9)) + 0.35, 1.0, 15.0)
    return jnp.where(h > 0, bits, 0.0)
