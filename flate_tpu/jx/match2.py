"""Fused Pallas LZ77 matcher — VMEM sorted-neighbor candidate scan.

Round-2's matcher carried 8-16 window words through a 9-operand sort and
materialized KPAD-halo'd tile copies through HBM — 111 of the 133 ms
per 4 MiB batch.  Round-3 redesign:

* **Selection on 8 bytes, extension by chaining.**  The sort carries
  only 1-2 window words (`nw` <= 4); candidates are ranked by the
  match length within that carry (<= 4*nw bytes) with distance as the
  tie-break, and `runs.extend_chains` recovers the full length of
  cap-saturated matches from same-distance continuations.  This cuts
  both the sort payload (9 -> 3 operands) and the kernel inner loop
  (K x 8 -> K x 2 word compares).
* **No halo materialization.**  Kernels receive the SAME tiled array
  twice under two BlockSpecs (block t and block t-1); the halo is a
  VMEM concat of the previous block's tail — HBM never sees a shifted
  copy (unaligned HBM slices run at 2-6 % of bandwidth on this TPU).
* **Key/word build in-kernel.**  `_prep` turns window tiles into the
  sort operands (14-bit Fibonacci-hash key + little-endian carry
  words) with static in-VMEM slices instead of XLA's unaligned
  window shifts.

Candidate semantics (same re-derivation as round 1): sort positions by
(hash, pos); after sorting, the K most recent same-hash predecessors of
a position are the K previous rows.  Any candidate that passes the
word-equality check is a valid DEFLATE back-reference regardless of how
it was produced, so the scan needs no exact chain reconstruction —
spurious candidates (bucket collisions, halo padding) are filtered by
the actual byte comparison and the distance bounds.

Reference hot loop being replaced: deflate.zig:248-263 + Lookup.zig.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts
from . import match as mtc
from . import runs

TILE = 8192
SUB = 8                          # sublane rows per tile
LANES = TILE // SUB              # 1024 lanes per row
POS_BITS = 18                    # window <= 256 KiB positions
POS_MASK = (1 << POS_BITS) - 1
HASH_BITS = 32 - POS_BITS        # 14-bit buckets (vs 15 in the host spec)
SENTINEL = np.uint32(0xFFFFFFFF)

# Tiles are (SUB, LANES) 2-D vregs, NOT (1, TILE): a (1, 8192) block
# occupies vregs at 1/8 sublane occupancy, so every vector op runs at
# 1/8 throughput — chip-measured 1.43 ms per candidate vs the ~0.18 ms
# the op count predicts.  Flat-order shifts across the 2-D layout are
# two lane-rolls + a select (runs.shift_back / runs.shift_fwd).
_lane_iota = runs.lane_iota
_shift_back = runs.shift_back
_shift_fwd = runs.shift_fwd


def _tz_bytes(x: jnp.ndarray) -> jnp.ndarray:
    cnt = ((x & 0xFF) == 0).astype(jnp.int32)
    cnt = cnt + ((x & 0xFFFF) == 0)
    cnt = cnt + ((x & 0xFFFFFF) == 0)
    return cnt + (x == 0)


# ---------------------------------------------------------------------------
# Prep kernel: window tiles -> (key, carry words) sort operands
# ---------------------------------------------------------------------------

FP_MUL = np.uint32(0x01000193)   # FNV prime — fingerprint polynomial


def _split_words(nw: int, fp: bool | int = False) -> tuple[int, int]:
    """Selection reach 4*nw bytes = ne EXACT carry words + nf
    fingerprint words, each fp_j covering bytes [4*ne*2^j, 4*ne*2^(j+1)).
    Fingerprints RANK candidates only (equal spans -> equal fp; a
    collision merely mis-ranks); emitted lengths come from the exact
    words, so output correctness never depends on them.

    fp=False (default/production): all-exact carry (ne=nw) — CPU
    measurement shows fp ranking with an 8-byte exact cap loses ~6.7%
    size at level 6 (same-distance chains must re-agree on the selected
    candidate every cap bytes and break); the fp path stays available
    for chip-time experiments paired with a top-k chain extension.
    fp=<int> pins ne explicitly (e.g. ne=4: 16-byte exact cap with
    fingerprints extending the RANKING reach to 4*nw) — a sort-payload
    economy measured against the size ratchets before adoption."""
    if not fp:
        return nw, 0
    ne = min(nw, fp if isinstance(fp, int) and fp is not True else 2)
    nf = 0
    reach = ne
    while reach < nw:
        reach *= 2
        nf += 1
    assert reach == nw, f"nw must be ne*2^k, got {nw}"
    return ne, nf


def _prep_kernel(ne: int, nf: int, hash_bytes: int, W: int,
                 cur_ref, nxt_ref, key_ref, words_ref):
    t = pl.program_id(1)
    cur = cur_ref[0, 0, :, :].astype(jnp.uint32)       # (SUB, LANES)
    nxt = nxt_ref[0, 0, :, :].astype(jnp.uint32)
    dn = jnp.concatenate([cur[1:, :], nxt[:1, :]], axis=0)
    lane = _lane_iota(cur.shape)
    nbytes = 4 * ne << nf
    planes = [cur] + [_shift_fwd(cur, dn, j, lane)
                      for j in range(1, max(nbytes, hash_bytes))]

    def le_word(w):
        return planes[4 * w] | (planes[4 * w + 1] << 8) \
            | (planes[4 * w + 2] << 16) | (planes[4 * w + 3] << 24)

    for w in range(ne):
        le = le_word(w)
        if w == 0 and hash_bytes < 4:
            le = le & jnp.uint32((1 << (8 * hash_bytes)) - 1)
        words_ref[0, 0, w] = le
    # fingerprint words: polynomial mix of the LE words in the span
    for j in range(nf):
        lo, hi = ne << j, ne << (j + 1)
        fp = le_word(lo)
        for w in range(lo + 1, hi):
            fp = fp * FP_MUL + le_word(w)
        words_ref[0, 0, ne + j] = fp
    # big-endian packed prefix for the Fibonacci hash (Lookup.zig:75-84)
    v = planes[0]
    for j in range(1, hash_bytes):
        v = (v << jnp.uint32(8)) | planes[j]
    h = (v * jnp.uint32(consts.HASH_MUL)) >> jnp.uint32(32 - HASH_BITS)
    sub = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
    pos = t * TILE + sub * LANES + lane
    key = (h << jnp.uint32(POS_BITS)) | pos.astype(jnp.uint32)
    # pad positions (>= W) sort to the end and can never be candidates
    key_ref[0, 0] = jnp.where(pos < W, key, SENTINEL)


@functools.partial(jax.jit, static_argnames=("ne", "nf", "hash_bytes",
                                             "interpret"))
def _prep(window: jnp.ndarray, ne: int, nf: int, hash_bytes: int,
          interpret: bool = False):
    """window (B, W) u8 -> (key (B, Wp) u32, words (B, T, nc, SUB,
    LANES) u32, flat order along the trailing (SUB, LANES))."""
    B, W = window.shape
    T = -(-W // TILE)
    Wp = T * TILE
    nc = ne + nf
    wpad = jnp.pad(window, ((0, 0), (0, Wp - W + TILE)))
    tiles = wpad.reshape(B, T + 1, SUB, LANES)
    key, words = pl.pallas_call(
        functools.partial(_prep_kernel, ne, nf, hash_bytes, W),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, SUB, LANES),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((B, T, nc, SUB, LANES), jnp.uint32),
        ),
        interpret=interpret,
    )(tiles, tiles)
    return key.reshape(B, Wp), words


# ---------------------------------------------------------------------------
# Matcher kernel: K sorted predecessors, halo from the previous block
# ---------------------------------------------------------------------------

def _matcher_kernel(K: int, ne: int, nf: int, top2: bool, *refs):
    """Blocks (1, 1, SUB, LANES): per operand, a (cur, prev) ref pair —
    prev is the SAME array at block index max(t-1, 0), so tile 0 masks
    its halo to the sentinel key instead of reading a sentinel tile
    (saves the halo concat + tile-major stack, ~55 MB of HBM copies
    per 8 MiB batch).  Candidate k is the flat predecessor at sorted
    distance k+1, reached with the 2-D roll-select shift (K <= LANES).

    Exact match length from the ne carry words (cap 4*ne bytes); the nf
    fingerprint words extend the RANKING reach to 4*ne*2^nf bytes —
    if the exact cap is hit and fp_0..fp_j agree, the candidate ranks
    as a 4*ne*2^(j+1)-byte match.  The EMITTED length is always the
    exact one, so fp collisions can only mis-rank, never corrupt."""
    nc = ne + nf
    kc_ref, kp_ref = refs[0], refs[1]
    meta_ref = refs[2 + 2 * nc]
    out_ref = refs[3 + 2 * nc]
    out2_ref = refs[4 + 2 * nc] if top2 else None
    first = pl.program_id(1) == 0
    tkey = kc_ref[0, 0]                                # (SUB, LANES) u32
    ptail = kp_ref[0, 0, SUB - 1:, :]
    ptail = jnp.where(first, SENTINEL, ptail)
    ukey = jnp.concatenate([ptail, tkey[:-1, :]], axis=0)
    lane = _lane_iota(tkey.shape)
    tpos = (tkey & POS_MASK).astype(jnp.int32)
    tbucket = tkey >> POS_BITS
    tw = [refs[2 + 2 * t][0, 0] for t in range(nc)]    # (SUB, LANES) each
    uw = [jnp.concatenate([refs[3 + 2 * t][0, 0, SUB - 1:, :],
                           tw[t][:-1, :]], axis=0) for t in range(nc)]
    min_src = meta_ref[0, 0, 0]
    limit = meta_ref[0, 0, 1]
    max_dist = meta_ref[0, 0, 2]
    maxlen = jnp.minimum(consts.MAX_MATCH_LEN, limit - tpos)
    cap = 4 * ne

    n = tpos.shape
    best_score = jnp.full(n, -1, jnp.int32)
    best_ld = jnp.zeros(n, jnp.uint32)
    if top2:
        sec_score = jnp.full(n, -1, jnp.int32)
        sec_ld = jnp.zeros(n, jnp.uint32)
    for k in range(K):
        d = k + 1
        ck = _shift_back(tkey, ukey, d, lane)
        cpos = (ck & POS_MASK).astype(jnp.int32)
        dist = tpos - cpos
        valid = ((ck >> POS_BITS) == tbucket) & (dist >= 1) \
            & (dist <= max_dist) & (cpos >= min_src) \
            & (cpos < limit)
        ml = jnp.zeros_like(tpos)
        run = (tkey == tkey)
        for t in range(ne):
            c = _tz_bytes(tw[t] ^ _shift_back(tw[t], uw[t], d, lane))
            ml = ml + jnp.where(run, c, 0)
            run = run & (c == 4)
        ml = jnp.minimum(ml, maxlen)
        est = ml
        fp_run = ml == cap
        for j in range(nf):
            fp_run = fp_run & (tw[ne + j] == _shift_back(
                tw[ne + j], uw[ne + j], d, lane))
            est = est + jnp.where(fp_run, cap << j, 0)
        score = (est << 16) - dist
        ok = valid & (ml >= consts.MIN_MATCH_LEN)
        upd = ok & (score > best_score)
        if top2:
            # candidates have pairwise-distinct distances, so demoting
            # the old best keeps the two tracked distances distinct
            upd2 = ok & ~upd & (score > sec_score)
            sec_score = jnp.where(upd, best_score,
                                  jnp.where(upd2, score, sec_score))
            sec_ld = jnp.where(upd, best_ld,
                               jnp.where(upd2, (ml.astype(jnp.uint32)
                                                << 16)
                                         | dist.astype(jnp.uint32),
                                         sec_ld))
        best_score = jnp.where(upd, score, best_score)
        best_ld = jnp.where(upd, (ml.astype(jnp.uint32) << 16)
                            | dist.astype(jnp.uint32), best_ld)
    out_ref[0, 0] = best_ld
    if top2:
        out2_ref[0, 0] = sec_ld


@functools.partial(jax.jit, static_argnames=("K", "ne", "nf", "top2",
                                             "interpret"))
def _run_matcher(skey_t: jnp.ndarray, swords: tuple, meta: jnp.ndarray,
                 K: int, ne: int, nf: int, top2: bool = False,
                 interpret: bool = False):
    """skey_t (B, T, SUB, LANES) + swords = nc arrays of the same shape
    (tiled sort results; free reshapes of the flat sorted operands).
    Each operand is passed twice -- block t and block max(t-1, 0) -- so
    the kernel assembles the halo in VMEM and tile 0 masks it to the
    sentinel key (no sentinel tile, no halo concat, no tile-major
    stack through HBM).  Returns (B, T*TILE) u32 best len<<16|dist per
    sorted row (a pair of them when top2)."""
    assert K <= LANES
    B, T, _, _ = skey_t.shape
    nc = ne + nf
    assert len(swords) == nc
    kern = functools.partial(_matcher_kernel, K, ne, nf, top2)
    ospec = pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.uint32)
    pair = [pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LANES),
                         lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM)]
    in_specs = list(pair)
    operands = [skey_t, skey_t]
    for w in swords:
        in_specs += pair
        operands += [w, w]
    in_specs.append(pl.BlockSpec((1, 1, 4), lambda b, t: (b, 0, 0),
                                 memory_space=pltpu.SMEM))
    operands.append(meta[:, None, :])
    out = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=(ospec, ospec) if top2 else ospec,
        out_shape=(oshape, oshape) if top2 else oshape,
        interpret=interpret,
    )(*operands)
    if top2:
        return out[0].reshape(B, T * TILE), out[1].reshape(B, T * TILE)
    return out.reshape(B, T * TILE)


def _candidate_pass(window, min_src_a, limit_a, *, K: int, nw: int,
                    hash_bytes: int, max_dist: int, interpret: bool,
                    fp: bool = False, top2: bool = False):
    """One hash-bucket candidate scan: hash -> carried sort -> kernel ->
    unsort.  Returns best (len << 16 | dist) u32 per position (a pair
    of them when top2)."""
    B, W = window.shape
    T = -(-W // TILE)
    Wp = T * TILE
    ne, nf = _split_words(nw, fp)
    nc = ne + nf

    key, words_t = _prep(window, ne, nf, hash_bytes, interpret=interpret)

    # carried-operand sort: the carry words ride along with the keys so
    # no post-sort gather is needed (take_along_axis scalarizes on TPU)
    words_flat = [words_t[:, :, t].reshape(B, Wp) for t in range(nc)]
    sorted_ops = jax.lax.sort([key] + words_flat, dimension=1, num_keys=1)
    skey = sorted_ops[0]
    spos = (skey & POS_MASK).astype(jnp.int32)

    # contiguous (free) re-tile of each sorted operand; the matcher
    # kernel reads block t-1 of the same arrays for the halo, so no
    # sentinel tile or tile-major stack is materialized
    skey_t = skey.reshape(B, T, SUB, LANES)
    swords_t = tuple(o.reshape(B, T, SUB, LANES) for o in sorted_ops[1:])

    meta = jnp.stack([
        min_src_a, limit_a,
        jnp.full((B,), max_dist, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    ], axis=1)
    # unsort: spos is a permutation of [0, W) (+ sentinel tails); sorting
    # by it carries the results back to position order without a scatter
    if top2:
        best, best2 = _run_matcher(skey_t, swords_t, meta, K, ne, nf,
                                   top2=True, interpret=interpret)
        _, ld, ld2 = jax.lax.sort(
            [spos.astype(jnp.uint32), best, best2],
            dimension=1, num_keys=1)
        return ld[:, :W], ld2[:, :W]
    best = _run_matcher(skey_t, swords_t, meta, K, ne, nf,
                        interpret=interpret)
    _, ld = jax.lax.sort([spos.astype(jnp.uint32), best],
                         dimension=1, num_keys=1)
    return ld[:, :W]


@functools.partial(jax.jit, static_argnames=("K", "nw", "hash_bytes", "ctx",
                                             "K3", "fp", "interpret"))
def find_matches_fused(window: jnp.ndarray, ctx_len: jnp.ndarray,
                       valid_len: jnp.ndarray, *, K: int, nw: int = 2,
                       hash_bytes: int = 4, ctx: int = mtc.CTX,
                       K3: int = 0, fp: bool = False,
                       interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (len, dist) per window position via the fused kernel.

    window: (B, W) uint8 = [ctx | shard] rows; ctx_len: valid context
    bytes per row; valid_len: real shard bytes per row (tail shards are
    zero-padded — positions beyond ctx+valid_len neither match nor serve
    as sources).  `nw` carry words bound the SELECTION length (4*nw
    bytes); full lengths are recovered by same-distance chain extension.
    K3 > 0 adds a 3-byte-hash pass (K3 candidates, dist <= 4096 —
    deflate's too-far economy for short matches) like the reference's
    min-length chain entries.  Returns (mlen, mdist) int32.
    """
    B, W = window.shape
    min_src_a = (ctx - ctx_len).astype(jnp.int32)
    limit_a = (ctx + valid_len).astype(jnp.int32)

    limit = (ctx + valid_len).astype(jnp.int32)
    if fp:
        # fingerprint ranking emits EXACT lengths capped at 4*ne bytes;
        # the top-2 chained extension recovers full lengths even when
        # the next position's best selection is a different distance
        ld, ld2 = _candidate_pass(
            window, min_src_a, limit_a, K=K, nw=nw, hash_bytes=4,
            max_dist=consts.MAX_DISTANCE, interpret=interpret,
            fp=fp, top2=True)
        mlen, mdist = runs.extend_chains2(
            (ld >> 16).astype(jnp.int32), (ld & 0xFFFF).astype(jnp.int32),
            (ld2 >> 16).astype(jnp.int32),
            (ld2 & 0xFFFF).astype(jnp.int32),
            limit, cap=4 * _split_words(nw, fp)[0],
            interpret=interpret)
    else:
        ld = _candidate_pass(window, min_src_a, limit_a, K=K, nw=nw,
                             hash_bytes=4, max_dist=consts.MAX_DISTANCE,
                             interpret=interpret)
        mlen = (ld >> 16).astype(jnp.int32)
        mdist = (ld & 0xFFFF).astype(jnp.int32)

    if K3 > 0:
        ld3 = _candidate_pass(window, min_src_a, limit_a, K=K3, nw=1,
                              hash_bytes=3, max_dist=4096,
                              interpret=interpret)
        l3 = jnp.minimum((ld3 >> 16).astype(jnp.int32), 3)
        d3 = (ld3 & 0xFFFF).astype(jnp.int32)
        s_main = jnp.where(mlen >= consts.MIN_MATCH_LEN,
                           (mlen << mtc.SCORE_SHIFT) - mdist, -1)
        s3 = jnp.where(l3 >= consts.MIN_MATCH_LEN,
                       (l3 << mtc.SCORE_SHIFT) - d3, -1)
        upd3 = s3 > s_main
        mlen = jnp.where(upd3, l3, mlen)
        mdist = jnp.where(upd3, d3, mdist)

    # small-distance exact runs (uncapped lengths) — VMEM Pallas kernel
    limit = (ctx + valid_len).astype(jnp.int32)
    min_src = (ctx - ctx_len).astype(jnp.int32)
    rlen, rdist = runs.small_dist_runs(window, limit, min_src,
                                       interpret=interpret)
    # sources must also stay inside the valid region for tail shards:
    # _small_dist_runs guarantees src = pos - d >= min_src + d only; the
    # equality chain construction already confines runs to real bytes
    # because padded zeros only extend runs of zeros that terminate at
    # the maxlen clamp.
    mscore = jnp.where(mlen >= consts.MIN_MATCH_LEN,
                       (mlen << mtc.SCORE_SHIFT) - mdist, -1)
    rscore = jnp.where(rlen >= consts.MIN_MATCH_LEN,
                       (rlen << mtc.SCORE_SHIFT) - rdist, -1)
    upd = rscore > mscore
    mlen = jnp.where(upd, rlen, mlen)
    mdist = jnp.where(upd, rdist, mdist)

    # same-distance continuation chains extend past the EXACT carry cap
    mlen = runs.extend_chains(mlen, mdist, limit,
                              cap=4 * _split_words(nw, fp)[0],
                              interpret=interpret)

    drop = (mlen == consts.MIN_MATCH_LEN) & (mdist > 4096)
    mlen = jnp.where(drop, 0, mlen)
    mdist = jnp.where(drop, 0, mdist)
    return mlen, mdist
