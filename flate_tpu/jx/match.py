"""Gather-free LZ77 match search on TPU — batch-native formulation.

The host spec (flate_tpu.deflate.find_matches) gathers candidate windows —
fine for numpy, catastrophic on TPU where XLA gathers scalarize.  This
module re-derives the same candidate semantics with no per-candidate
gathers, no 64-bit arithmetic, and no vmap (every op carries the batch
dimension natively: vmap-of-scatter/sort lowers badly on TPU):

1. pack each position's next 32 bytes into eight u32 lanes (vector shifts);
2. batched argsort by (hash4, pos); after sorting, the K most recent
   same-hash predecessors of a position are simply the K previous rows, so
   candidate scoring is a fori_loop of rolls + vector compares;
3. match length within the carried 32 bytes = trailing-zero-byte count of
   XOR'd lanes (mask ladder);
4. lengths beyond 32 are recovered exactly in two gather-free passes:
   small-distance run lengths (reverse associative scan) and general-
   distance same-d continuation chains (reverse affine scan, stride 32);
5. one flattened scatter returns results to position order.

All arrays are (B, W); shard batch B is the leading axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import consts

CTX = consts.MAX_DISTANCE            # context bytes prepended to each shard
CAP = 32
SMALL_DISTS = (1, 2, 3, 4, 8)
SCORE_SHIFT = 16                     # score = (len << 16) - dist; dist<=32768


def _take(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched last-axis gather: out[b, i] = arr[b, idx[b, i]]."""
    return jnp.take_along_axis(arr, idx, axis=-1)


def _pack_words_u32(window: jnp.ndarray, nwords: int) -> jnp.ndarray:
    """out[b, i, t] = bytes window[b, i+4t .. i+4t+4) packed LE u32,
    shape (B, W, nwords) — row-major so the sort permutation applies with
    ONE row gather (measured 8x faster than per-word gathers on TPU).
    Reads past the end see zeros."""
    B, W = window.shape
    ext = jnp.concatenate([
        window, jnp.zeros((B, 4 * nwords + 4), dtype=window.dtype)
    ], axis=1).astype(jnp.uint32)
    words = []
    for t in range(nwords):
        w = jnp.zeros((B, W), dtype=jnp.uint32)
        for j in range(4):
            o = 4 * t + j
            w = w | (ext[:, o:o + W] << jnp.uint32(8 * j))
        words.append(w)
    return jnp.stack(words, axis=2)


def _tz_bytes_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Count of low-order zero BYTES of a u32 (0..4)."""
    cnt = ((x & 0xFF) == 0).astype(jnp.int32)
    cnt = cnt + ((x & 0xFFFF) == 0)
    cnt = cnt + ((x & 0xFFFFFF) == 0)
    cnt = cnt + (x == 0)
    return cnt


def _match_len(words_a: jnp.ndarray, words_b: jnp.ndarray) -> jnp.ndarray:
    """Common-prefix byte length of (B, N, nw) u32 window-word rows."""
    nw = words_a.shape[-1]
    total = jnp.zeros(words_a.shape[:-1], jnp.int32)
    carry = jnp.ones(words_a.shape[:-1], jnp.bool_)
    for t in range(nw):
        c = _tz_bytes_u32(words_a[..., t] ^ words_b[..., t])
        total = total + jnp.where(carry, c, 0)
        carry = carry & (c == 4)
    return total


def _hashes(window: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """15-bit Fibonacci hash of each position's next `nbytes` bytes;
    positions lacking a full prefix get unique never-matching buckets."""
    B, W = window.shape
    ext = jnp.concatenate([
        window, jnp.zeros((B, nbytes), window.dtype)], axis=1
    ).astype(jnp.uint32)
    v = jnp.zeros((B, W), jnp.uint32)
    for j in range(nbytes):
        v = (v << jnp.uint32(8)) | ext[:, j:j + W]
    h = ((v * jnp.uint32(consts.HASH_MUL))
         >> jnp.uint32(32 - consts.LOOKUP_BITS)).astype(jnp.int32)
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    return jnp.where(pos >= W - (nbytes - 1),
                     (1 << consts.LOOKUP_BITS) + pos, h)


def _unsort_scatter(spos: jnp.ndarray, *vals, fill=0) -> list[jnp.ndarray]:
    """Scatter sorted-order values back to position order, batched via one
    flattened 1D scatter per array."""
    B, W = spos.shape
    base = (jnp.arange(B, dtype=jnp.int32) * W)[:, None]
    flat_idx = (base + spos).reshape(-1)
    out = []
    for v, f in vals:
        o = jnp.full(B * W, f, v.dtype).at[flat_idx].set(v.reshape(-1))
        out.append(o.reshape(B, W))
    return out


def _candidate_best(h: jnp.ndarray, words, K: int,
                    min_src: jnp.ndarray, maxlen_of_pos: jnp.ndarray,
                    min_len: int) -> tuple[jnp.ndarray, ...]:
    """Scan K sorted same-hash predecessors; returns per-position
    (best_len, best_dist, best_score), position order, shape (B, W)."""
    B, W = h.shape
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    spos = jnp.argsort(h, axis=-1, stable=True).astype(jnp.int32)
    sh = _take(h, spos)
    swords = jnp.take_along_axis(words, spos[:, :, None], axis=1)
    smaxlen = jnp.minimum(consts.MAX_MATCH_LEN,
                          W - spos)  # maxlen by true position

    def body(k, carry):
        best_score, best_len, best_dist, ch, cpos, cwords = carry
        ch = jnp.roll(ch, 1, axis=-1)
        cpos = jnp.roll(cpos, 1, axis=-1)
        cwords = jnp.roll(cwords, 1, axis=1)
        dist = spos - cpos
        valid = ((ch == sh) & (pos >= k) & (dist >= 1)
                 & (dist <= consts.MAX_DISTANCE)
                 & (cpos >= min_src[:, None]))
        ml = jnp.minimum(_match_len(swords, cwords), smaxlen)
        score = (ml << SCORE_SHIFT) - dist
        score = jnp.where(valid & (ml >= min_len), score, -1)
        upd = score > best_score
        return (jnp.where(upd, score, best_score),
                jnp.where(upd, ml, best_len),
                jnp.where(upd, dist, best_dist),
                ch, cpos, cwords)

    init = (jnp.full((B, W), -1, jnp.int32), jnp.zeros((B, W), jnp.int32),
            jnp.zeros((B, W), jnp.int32), sh, spos, swords)
    best_score, best_len, best_dist, *_ = jax.lax.fori_loop(
        1, K + 1, body, init)

    mlen, mdist, mscore = _unsort_scatter(
        spos, (best_len, 0), (best_dist, 0), (best_score, -1))
    return mlen, mdist, mscore


def _small_dist_runs(window: jnp.ndarray, maxlen: jnp.ndarray,
                     min_src: jnp.ndarray
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact full match lengths for the special small distances via a
    reverse 'leading ones' associative scan.  Returns (len, dist)."""
    B, W = window.shape
    best_len = jnp.zeros((B, W), jnp.int32)
    best_dist = jnp.zeros((B, W), jnp.int32)
    arange = jnp.arange(W, dtype=jnp.int32)[None, :]

    # all distances batched into one (D*B, W) run-length doubling pass —
    # one set of 9 saturating rounds instead of one per distance
    eqs = []
    for d in SMALL_DISTS:
        eq = jnp.concatenate([
            jnp.zeros((B, d), jnp.bool_),
            window[:, d:] == window[:, :-d],
        ], axis=1)
        eqs.append(eq & (arange >= (min_src[:, None] + d)))
    cnt = jnp.concatenate(eqs, axis=0).astype(jnp.int32)   # (D*B, W)
    step = 1
    while step <= consts.MAX_MATCH_LEN:
        shifted = jnp.concatenate(
            [cnt[:, step:],
             jnp.zeros((cnt.shape[0], step), jnp.int32)], axis=1)
        cnt = cnt + jnp.where(cnt == step, shifted, 0)
        step *= 2

    for j, d in enumerate(SMALL_DISTS):
        ln = jnp.minimum(jnp.minimum(cnt[j * B:(j + 1) * B],
                                     consts.MAX_MATCH_LEN), maxlen)
        score_new = (ln << SCORE_SHIFT) - d
        score_old = (best_len << SCORE_SHIFT) - best_dist
        upd = (ln >= consts.MIN_MATCH_LEN) & \
            ((best_len == 0) | (score_new > score_old))
        best_len = jnp.where(upd, ln, best_len)
        best_dist = jnp.where(upd, d, best_dist)
    return best_len, best_dist


def _extend_chains(mlen: jnp.ndarray, mdist: jnp.ndarray,
                   maxlen: jnp.ndarray, cap: int = CAP) -> jnp.ndarray:
    """Compose capped same-distance matches along stride-32 chains.

    If mlen[i] == CAP (capped) and mdist[i + CAP] == mdist[i], the true
    length is CAP + true_len(i + CAP): a reverse affine associative scan
    per stride-32 chain resolves all compositions at once."""
    B, W = mlen.shape
    pad = (-W) % cap
    if pad:
        mlen = jnp.concatenate(
            [mlen, jnp.zeros((B, pad), mlen.dtype)], axis=1)
        mdist = jnp.concatenate(
            [mdist, jnp.zeros((B, pad), mdist.dtype)], axis=1)
    rows = mlen.shape[1] // cap
    # lane-friendly layout: (B, cap, rows) keeps the long axis minor so
    # the per-round shifts run on full 128-lane registers (the (rows,
    # cap) layout wastes 8x on a 16-wide minor dim)
    l2 = jnp.transpose(mlen.reshape(B, rows, cap), (0, 2, 1))
    d2 = jnp.transpose(mdist.reshape(B, rows, cap), (0, 2, 1))
    nxt_d = jnp.concatenate(
        [d2[:, :, 1:], jnp.zeros((B, cap, 1), d2.dtype)], axis=2)
    chain = (l2 == cap) & (nxt_d == d2) & (d2 > 0)

    # Bounded fixed-point instead of an associative scan: a composed
    # chain only matters up to MAX_MATCH_LEN total, i.e. at most
    # ceil(258/cap) links, so ceil+1 rounds of "if chained, cap + next"
    # converge exactly (values are clamped so deeper chains saturate).
    # (A reverse affine associative_scan here miscomputed on real TPU
    # hardware at production shapes — the iteration avoids the construct
    # entirely and compiles leaner.)
    rounds = -(-consts.MAX_MATCH_LEN // cap) + 1
    zero_tail = jnp.zeros((B, cap, 1), jnp.int32)
    total = l2.astype(jnp.int32)
    for _ in range(rounds):
        nxt = jnp.concatenate([total[:, :, 1:], zero_tail], axis=2)
        total = jnp.where(chain,
                          jnp.minimum(cap + nxt, 2 * consts.MAX_MATCH_LEN),
                          l2)
    out = jnp.transpose(total, (0, 2, 1)).reshape(B, -1)[:, :W]
    out = jnp.minimum(out, consts.MAX_MATCH_LEN)
    return jnp.minimum(out, maxlen)


@functools.partial(jax.jit, static_argnames=("K", "K3", "min_len", "ctx",
                                             "nwords"))
def find_matches_device(window: jnp.ndarray, ctx_len: jnp.ndarray,
                        K: int = 64, K3: int = 8, min_len: int = 3,
                        ctx: int = CTX, nwords: int = 8
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (len, dist) per window position on device.

    window: (B, W) uint8 = [ctx context bytes | shard bytes] per row;
    positions with index < ctx - ctx_len[b] are invalid sources (unprimed
    context).  Returns (mlen, mdist) of shape (B, W) — entries for context
    positions are computed too and simply ignored by the parser.
    """
    B, W = window.shape
    pos_arange = jnp.arange(W, dtype=jnp.int32)[None, :]
    maxlen_of_pos = jnp.minimum(consts.MAX_MATCH_LEN, W - pos_arange)
    maxlen_of_pos = jnp.broadcast_to(maxlen_of_pos, (B, W))
    min_src = (ctx - ctx_len).astype(jnp.int32)

    # main table: 4-byte hash, 4*nwords carried bytes
    mlen, mdist, mscore = _candidate_best(
        _hashes(window, 4), _pack_words_u32(window, nwords), K,
        min_src, maxlen_of_pos, min_len)

    # secondary table: 3-byte hash, 8 carried bytes (len 3..8 discovery)
    mlen3, mdist3, mscore3 = _candidate_best(
        _hashes(window, 3), _pack_words_u32(window, 2), K3,
        min_src, maxlen_of_pos, min_len)
    upd = mscore3 > mscore
    mlen = jnp.where(upd, mlen3, mlen)
    mdist = jnp.where(upd, mdist3, mdist)
    mscore = jnp.maximum(mscore, mscore3)

    # small-distance exact runs (full lengths, no cap)
    rlen, rdist = _small_dist_runs(window, maxlen_of_pos, min_src)
    rscore = jnp.where(rlen >= consts.MIN_MATCH_LEN,
                       (rlen << SCORE_SHIFT) - rdist, -1)
    upd = rscore > mscore
    mlen = jnp.where(upd, rlen, mlen)
    mdist = jnp.where(upd, rdist, mdist)

    # general-distance extension past the carry cap
    mlen = _extend_chains(mlen, mdist, maxlen_of_pos, cap=4 * nwords)

    # too-far heuristic for minimum-length matches
    drop = (mlen == consts.MIN_MATCH_LEN) & (mdist > 4096)
    mlen = jnp.where(drop, 0, mlen)
    mdist = jnp.where(drop, 0, mdist)
    return mlen, mdist
