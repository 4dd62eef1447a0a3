"""Deflate compression engine: massively-parallel LZ77 formulation.

The reference's hot loop is a serial hash-chain walk with one-step lazy
matching (/root/reference/src/flate/deflate.zig:154-266, Lookup.zig).  That
formulation is order-dependent and unusable on a TPU, so this engine
re-derives the same *capability* as data-parallel array passes (the numpy
implementation here is the specification; flate_tpu.jx mirrors it in jnp for
the device):

1. hash every position's 4-byte prefix (Fibonacci hash, Lookup.zig:75-84);
2. rank positions by (hash, pos) with one sort; the K most recent same-hash
   predecessors of each position are its match candidates — the parallel
   analogue of walking `chain` links, with K per level (consts.LEVEL_PARAMS);
3. score all candidates at once: vectorized 32-byte prefix compare, then
   extend only each position's best match to the full 258 limit;
4. one-step lazy arbitration becomes a per-position decision (defer when the
   next position's match is strictly longer), and the greedy token parse —
   "jump len bytes after a match" — becomes pointer-doubling over the
   next[] successor array (log2 N rounds);
5. surviving positions compact into the token array.

Because candidate scoring is exhaustive over the K most recent predecessors
(the chain walk inspects the same set one at a time and keeps the best), the
parse is never worse than the reference's for the same K, and compressed
sizes at a given level are <= the reference's in practice.

Shards (consts.SHARD_LEN) are compressed independently, pigz-style, each
primed with the previous shard's last 32K as read-only context so
cross-shard matches survive.  A sync-flush marker (empty stored block,
deflate.zig:268-289 semantics) byte-aligns each shard so multi-chip
bitstreams splice with pure byte concatenation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import consts
from .bitpack import BitSink
from .block import Tokens, write_block, write_flush_marker

# emit a length-3 match only when it is close enough to be worth it
# (zlib's TOO_FAR heuristic; the modern reference avoids len-3 entirely by
# using min match 4 — consts.zig:11 — so this is never worse than it).
TOO_FAR = 4096


def _hash4(window: np.ndarray) -> np.ndarray:
    """15-bit Fibonacci hash of each position's next 4 bytes."""
    w = window.astype(np.uint32)
    v = (w[:-3] << 24) | (w[1:-2] << 16) | (w[2:-1] << 8) | w[3:]
    h = (v * np.uint32(consts.HASH_MUL)) >> np.uint32(32 - consts.LOOKUP_BITS)
    return h.astype(np.int64)


def _hash3(window: np.ndarray) -> np.ndarray:
    """15-bit hash of each position's next 3 bytes (len-3 match discovery;
    zlib hashes 3 bytes — the modern reference's 4-byte hash loses all
    length-3 matches, measurably ~2% on binary data)."""
    w = window.astype(np.uint32)
    v = (w[:-2] << 16) | (w[1:-1] << 8) | w[2:]
    h = (v * np.uint32(consts.HASH_MUL)) >> np.uint32(32 - consts.LOOKUP_BITS)
    return h.astype(np.int64)


def _recent_candidates(h: np.ndarray, pos: np.ndarray, K: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(cand, valid): the K most recent positions with the same hash value
    preceding each position in `pos`, via one (hash, pos) sort."""
    npos = h.size
    key = h * np.int64(npos) + np.arange(npos, dtype=np.int64)
    order = np.argsort(key, kind="stable")
    rank = np.empty(npos, dtype=np.int64)
    rank[order] = np.arange(npos, dtype=np.int64)
    r = rank[pos]
    cand_rank = r[None, :] - np.arange(1, K + 1, dtype=np.int64)[:, None]
    valid = cand_rank >= 0
    cand = order[np.clip(cand_rank, 0, None)]          # (K, P)
    valid &= h[cand] == h[pos][None, :]
    dist = pos[None, :] - cand
    valid &= (dist >= consts.MIN_DISTANCE) & (dist <= consts.MAX_DISTANCE)
    return cand, valid


def find_matches(window: np.ndarray, start: int, K: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Best match (len, dist) for every position >= start in window.

    window: uint8 array (context + shard data); start: first encodable
    position.  Returns (mlen, mdist) arrays for positions start..W-1.
    Matches never extend past the end of the window and are always
    backwards references with dist <= MAX_DISTANCE.
    """
    W = window.size
    N = W - start
    mlen = np.zeros(N, dtype=np.int32)
    mdist = np.zeros(N, dtype=np.int32)
    if W < 4 or N <= 0:
        return mlen, mdist

    h4 = _hash4(window)                     # hashes for pos 0..W-4
    pos = np.arange(start, W - 3, dtype=np.int64)
    if pos.size == 0:
        return mlen, mdist
    cand4, valid4 = _recent_candidates(h4, pos, K)

    # secondary 3-byte-hash table catches length-3 matches the 4-byte hash
    # cannot see (a few most-recent candidates suffice: a len-3 match is
    # only emitted when close — TOO_FAR — and no longer match exists)
    K3 = min(8, K)
    h3 = _hash3(window)[:h4.size]           # align position ranges
    cand3, valid3 = _recent_candidates(h3, pos, K3)

    cand = np.concatenate([cand4, cand3], axis=0)      # (K+K3, P)
    valid = np.concatenate([valid4, valid3], axis=0)
    dist = pos[None, :] - cand

    # tier 1: match length capped at 32 via one vectorized compare
    CAP = 32
    padded = np.concatenate([window, np.zeros(CAP, dtype=np.uint8)])
    view = np.lib.stride_tricks.sliding_window_view(padded, CAP)  # (W+1, CAP)
    eq = view[cand] == view[pos][None, :]               # (K, P, CAP) bool
    len32 = np.cumprod(eq, axis=2, dtype=np.uint8).sum(axis=2).astype(np.int32)
    len32 = np.where(valid, len32, 0)
    # clamp to window end (the zero padding can only inflate, never deflate)
    maxlen = np.minimum(consts.MAX_MATCH_LEN, W - pos).astype(np.int32)
    len32 = np.minimum(len32, maxlen[None, :])

    # rank candidates: longest, then closest
    score = (len32.astype(np.int64) << 17) - dist
    score = np.where(valid & (len32 >= consts.MIN_MATCH_LEN), score, -1)
    P = pos.size
    ar = np.arange(P)

    def _extend(cpos: np.ndarray, cdist: np.ndarray, clen: np.ndarray
                ) -> np.ndarray:
        """tier 2: extend cap-hit matches to the full 258 limit."""
        clen = clen.copy()
        csrc = cpos - cdist
        lim = np.minimum(consts.MAX_MATCH_LEN, W - cpos).astype(np.int32)
        alive = (clen == CAP) & (lim > CAP)
        for _ in range(1, (consts.MAX_MATCH_LEN + CAP - 1) // CAP + 1):
            idx = np.flatnonzero(alive)
            if idx.size == 0:
                break
            o = clen[idx]
            e = view[csrc[idx] + o] == view[cpos[idx] + o]
            ext = np.cumprod(e, axis=1, dtype=np.uint8).sum(axis=1)
            clen[idx] = np.minimum(clen[idx] + ext.astype(np.int32), lim[idx])
            alive[idx] = (ext == CAP) & (clen[idx] < lim[idx])
        return clen

    # candidates capped at 32 bytes tie in tier-1 ranking; extend the top-T
    # per position to full length before choosing (a chain walk compares at
    # full length every step — T=3 recovers that ranking fidelity)
    T = min(3, score.shape[0])
    top = np.argpartition(-score, T - 1, axis=0)[:T]    # (T, P)
    tlen = len32[top, ar[None, :]]
    tdist = dist[top, ar[None, :]].astype(np.int32)
    tvalid = score[top, ar[None, :]] >= 0
    need = tvalid & (tlen == CAP)
    if need.any():
        flat = np.flatnonzero(need.ravel())
        cpos = np.broadcast_to(pos[None, :], tlen.shape).ravel()[flat]
        elen = _extend(cpos, tdist.ravel()[flat], tlen.ravel()[flat])
        tlen_flat = tlen.ravel().copy()
        tlen_flat[flat] = elen
        tlen = tlen_flat.reshape(tlen.shape)
    tscore = (tlen.astype(np.int64) << 17) - tdist
    tscore = np.where(tvalid, tscore, -1)
    bi = np.argmax(tscore, axis=0)
    blen = tlen[bi, ar]
    bdist = tdist[bi, ar]
    bvalid = tscore[bi, ar] >= 0

    # too-far heuristic for minimum-length matches
    bvalid &= ~((blen == 3) & (bdist > TOO_FAR))

    out_idx = (pos - start).astype(np.int64)
    mlen[out_idx] = np.where(bvalid, blen, 0)
    mdist[out_idx] = np.where(bvalid, bdist, 0)
    return mlen, mdist


def lazy_parse(mlen: np.ndarray, mdist: np.ndarray,
               lazy: bool, max_lazy: int) -> np.ndarray:
    """Greedy/lazy token parse as pointer doubling.

    Returns a bool array: True where a token starts.  The per-position
    decision reproduces the reference's one-step-lazy automaton
    (deflate.zig:159-191): a match is deferred in favour of a literal when
    the next position holds a strictly longer match (and the current match
    is below the level's lazy threshold)."""
    N = mlen.size
    take = mlen >= consts.MIN_MATCH_LEN
    if lazy and N > 1:
        nxt_len = np.concatenate([mlen[1:], [0]])
        defer = (nxt_len > mlen) & (mlen < max_lazy)
        take &= ~defer
    step = np.where(take, np.maximum(mlen, 1), 1).astype(np.int64)
    nxt = np.minimum(np.arange(N, dtype=np.int64) + step, N)

    # pointer doubling: mark every position reachable from 0 via nxt[]
    on = np.zeros(N + 1, dtype=bool)
    on[0] = True
    jump = np.concatenate([nxt, [N]])
    rounds = max(1, int(np.ceil(np.log2(max(N, 2)))))
    for _ in range(rounds):
        np.maximum.at(on, jump[on.nonzero()[0]], True)
        jump = jump[jump]
    return on[:N]


def tokenize_shard(data: np.ndarray, context: np.ndarray | None,
                   level: int) -> Tokens:
    """Produce the token stream for one shard (parallel formulation)."""
    if level not in consts.LEVEL_PARAMS:
        raise ValueError(
            f"invalid compression level {level}: expected one of "
            f"{sorted(consts.LEVEL_PARAMS)} (or use the store/huffman modes)")
    K, nice, lazy, max_lazy = consts.LEVEL_PARAMS[level]
    data = np.asarray(data, dtype=np.uint8)
    if context is None or context.size == 0:
        window = data
        start = 0
    else:
        context = np.asarray(context[-consts.MAX_DISTANCE:], dtype=np.uint8)
        window = np.concatenate([context, data])
        start = context.size

    mlen, mdist = find_matches(window, start, K)
    starts = lazy_parse(mlen, mdist, lazy, max_lazy)
    idx = np.flatnonzero(starts)
    # re-derive the same take-match decision lazy_parse stepped with: a
    # position on the path emits its match iff it was not deferred there
    if lazy:
        nxt_len = np.concatenate([mlen[1:], [0]])
        defer = (nxt_len > mlen) & (mlen < max_lazy)
        decided = (mlen >= consts.MIN_MATCH_LEN) & ~defer
    else:
        decided = mlen >= consts.MIN_MATCH_LEN
    length = np.where(decided[idx], mlen[idx], 0).astype(np.int32)
    dist = np.where(decided[idx], mdist[idx], 0).astype(np.int32)
    toks = Tokens(lit=data[idx], length=length, dist=dist)
    if level >= 4:
        # the optimal-parse squeeze costs ~ms per shard (native C DP) and
        # is worth ~2-3% at every lazy level; levels 1-3 stay greedy-only
        # as the speed tier
        toks = _squeeze(data, mlen, mdist, toks)
    return toks


def _squeeze(data: np.ndarray, mlen: np.ndarray, mdist: np.ndarray,
             toks: Tokens, iterations: int = 2) -> Tokens:
    """Cost-model-optimal re-parse (zopfli-style squeeze) for the best
    level: iterate (histogram -> code costs -> C DP parse).  Strictly
    better than greedy+lazy under the entropy model, which is how level 9
    goes below zlib/reference sizes.  No-op without the native library."""
    from . import native, tables
    from .block import token_histograms
    from .huffman import huffman_code_lengths

    for _ in range(iterations):
        freq_ll, freq_d = token_histograms(toks)
        ll_lens = huffman_code_lengths(freq_ll, consts.MAX_CODE_BITS)
        d_lens = huffman_code_lengths(freq_d, consts.MAX_CODE_BITS)
        # unused symbols get a mild fallback cost so the DP may still
        # introduce them when clearly profitable
        lit_bits = np.where(ll_lens[:256] > 0, ll_lens[:256], 13)
        lenc = np.where(ll_lens[257:286] > 0, ll_lens[257:286], 13)
        lenc_bits = lenc + tables.LENGTH_EXTRA_BITS
        db = np.where(d_lens > 0, d_lens, 13)
        dist_bits = db + tables.DIST_EXTRA_BITS
        res = native.optimal_parse(mlen, mdist, data, lit_bits,
                                   lenc_bits, dist_bits)
        if res is None:
            return toks
        take, sel = res
        idx = np.flatnonzero(take)
        length = sel[idx].astype(np.int32)
        dist = np.where(length > 0, mdist[idx], 0).astype(np.int32)
        toks = Tokens(lit=data[idx], length=length, dist=dist)
    return toks


@dataclass
class CompressOptions:
    level: int = consts.LEVEL_DEFAULT
    shard_len: int = consts.SHARD_LEN
    context: bool = True         # prime each shard with previous 32K
    sync_flush: bool = True      # byte-align shard boundaries (pigz-style)
    # device-path knobs (api.py device=True -> jx.pipeline2)
    ctx: int = 0                 # 0 = full 32 KiB DEFLATE window
    batch: int = 64              # shards per device dispatch
    interpret: bool = False      # Pallas interpret mode (tests)


def deflate_tokens(data: bytes, opts: CompressOptions,
                   sink: BitSink) -> None:
    """Tokenize + encode all shards of `data` into `sink` (raw deflate)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    if n == 0:
        write_block(sink, Tokens.literals(np.zeros(0, dtype=np.uint8)),
                    final=True, raw=b"")
        return
    nshards = -(-n // opts.shard_len)
    for s in range(nshards):
        lo = s * opts.shard_len
        hi = min(n, lo + opts.shard_len)
        shard = arr[lo:hi]
        ctx = arr[max(0, lo - consts.MAX_DISTANCE):lo] if (opts.context and lo) else None
        toks = tokenize_shard(shard, ctx, opts.level)
        final = s == nshards - 1
        write_block(sink, toks, final=final, raw=shard.tobytes())
        if not final and opts.sync_flush:
            write_flush_marker(sink)
