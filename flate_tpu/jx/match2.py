"""Fused Pallas LZ77 matcher — VMEM sorted-neighbor candidate scan.

Round-1's matcher (jx/match.py) materialized K rolled copies of the
(B, W, nwords) carried-window array through HBM — the measured encode
bottleneck (~140 ms per MiB).  This kernel keeps the sorted window words
resident in VMEM tiles and scans the K most-recent same-bucket
predecessors with vector rolls, so HBM sees each byte O(1) times.

Candidate semantics (same re-derivation as round 1): sort positions by
(hash, pos); after sorting, the K most recent same-hash predecessors of
a position are the K previous rows.  Any candidate that passes the
word-equality check is a valid DEFLATE back-reference regardless of how
it was produced, so the scan needs no exact chain reconstruction —
spurious candidates (roll wrap-around, bucket collisions, halo padding)
are filtered by the actual byte comparison and the distance bounds.

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
KPAD = 256                       # supports K up to 256
POS_BITS = 18                    # window <= 256 KiB positions
POS_MASK = (1 << POS_BITS) - 1
HASH_BITS = 32 - POS_BITS        # 14-bit buckets (vs 15 in the host spec)


def _hashes14(window: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """14-bit Fibonacci hash of each position's next `nbytes` bytes."""
    B, W = window.shape
    ext = jnp.concatenate(
        [window, jnp.zeros((B, nbytes), window.dtype)], axis=1
    ).astype(jnp.uint32)
    v = jnp.zeros((B, W), jnp.uint32)
    for j in range(nbytes):
        v = (v << jnp.uint32(8)) | ext[:, j:j + W]
    return ((v * jnp.uint32(consts.HASH_MUL))
            >> jnp.uint32(32 - HASH_BITS)).astype(jnp.uint32)


def _tz_bytes(x: jnp.ndarray) -> jnp.ndarray:
    cnt = ((x & 0xFF) == 0).astype(jnp.int32)
    cnt = cnt + ((x & 0xFFFF) == 0)
    cnt = cnt + ((x & 0xFFFFFF) == 0)
    return cnt + (x == 0)


def _matcher_kernel_slice(K: int, nw: int,
                          skey_ref, swords_ref, meta_ref, out_ref):
    """Unrolled static-slice variant: candidate k is the halo'd block at
    lane offset KPAD-1-k — no loop-carried rolls, better ILP."""
    tkey = skey_ref[0, 0, :, KPAD:]                    # (1, TILE) u32
    tpos = (tkey & POS_MASK).astype(jnp.int32)
    tbucket = tkey >> POS_BITS
    tw = [swords_ref[0, 0, t:t + 1, KPAD:] for t in range(nw)]
    min_src = meta_ref[0, 0, 0]
    limit = meta_ref[0, 0, 1]
    max_dist = meta_ref[0, 0, 2]
    maxlen = jnp.minimum(consts.MAX_MATCH_LEN, limit - tpos)

    n = tpos.shape
    best_score = jnp.full(n, -1, jnp.int32)
    best_ld = jnp.zeros(n, jnp.uint32)
    for k in range(K):
        o = KPAD - 1 - k
        ck = skey_ref[0, 0, :, o:o + TILE]
        cpos = (ck & POS_MASK).astype(jnp.int32)
        dist = tpos - cpos
        valid = ((ck >> POS_BITS) == tbucket) & (dist >= 1) \
            & (dist <= max_dist) & (cpos >= min_src) \
            & (cpos < limit)
        ml = jnp.zeros_like(tpos)
        run = (tkey == tkey)
        for t in range(nw):
            c = _tz_bytes(tw[t] ^ swords_ref[0, 0, t:t + 1, o:o + TILE])
            ml = ml + jnp.where(run, c, 0)
            run = run & (c == 4)
        ml = jnp.minimum(ml, maxlen)
        score = (ml << 16) - dist
        upd = valid & (ml >= consts.MIN_MATCH_LEN) & (score > best_score)
        best_score = jnp.where(upd, score, best_score)
        best_ld = jnp.where(upd, (ml.astype(jnp.uint32) << 16)
                            | dist.astype(jnp.uint32), best_ld)
    out_ref[0, 0, :, :] = best_ld


def _matcher_kernel(K: int, nw: int,
                    skey_ref, swords_ref, meta_ref, out_ref):
    """Grid (B, T).  Blocks carry a KPAD halo of preceding sorted rows.
    out: best (len << 16 | dist) per target row, sorted order."""
    tkey = skey_ref[0, 0, :, KPAD:]                    # (1, TILE) u32
    tpos = (tkey & POS_MASK).astype(jnp.int32)
    tbucket = tkey >> POS_BITS
    tw = [swords_ref[0, 0, t:t + 1, KPAD:] for t in range(nw)]
    min_src = meta_ref[0, 0, 0]
    limit = meta_ref[0, 0, 1]
    max_dist = meta_ref[0, 0, 2]
    maxlen = jnp.minimum(consts.MAX_MATCH_LEN, limit - tpos)

    def body(_, carry):
        best_score, best_ld, ckey, cw = carry
        ckey = pltpu.roll(ckey, 1, 1)
        cw = [pltpu.roll(w, 1, 1) for w in cw]
        ck = ckey[:, KPAD:]
        cpos = (ck & POS_MASK).astype(jnp.int32)
        dist = tpos - cpos
        valid = ((ck >> POS_BITS) == tbucket) & (dist >= 1) \
            & (dist <= max_dist) & (cpos >= min_src) \
            & (cpos < limit)
        ml = jnp.zeros_like(tpos)
        run = (tkey == tkey)                           # all-true bool
        for t in range(nw):
            c = _tz_bytes(tw[t] ^ cw[t][:, KPAD:])
            ml = ml + jnp.where(run, c, 0)
            run = run & (c == 4)
        ml = jnp.minimum(ml, maxlen)
        score = (ml << 16) - dist
        upd = valid & (ml >= consts.MIN_MATCH_LEN) & (score > best_score)
        best_score = jnp.where(upd, score, best_score)
        best_ld = jnp.where(upd, (ml.astype(jnp.uint32) << 16)
                            | dist.astype(jnp.uint32), best_ld)
        return best_score, best_ld, ckey, cw

    n = tpos.shape
    init = (jnp.full(n, -1, jnp.int32), jnp.zeros(n, jnp.uint32),
            skey_ref[0, 0, :, :],
            [swords_ref[0, 0, t:t + 1, :] for t in range(nw)])
    best_score, best_ld, _, _ = jax.lax.fori_loop(0, K, body, init)
    out_ref[0, 0, :, :] = best_ld


import os

_KERNEL_VARIANT = os.environ.get("FLATE_TPU_MATCH_KERNEL", "slice")


@functools.partial(jax.jit, static_argnames=("K", "nw", "interpret"))
def _run_matcher(skey_t: jnp.ndarray, swords_t: jnp.ndarray,
                 meta: jnp.ndarray, K: int, nw: int,
                 interpret: bool = False) -> jnp.ndarray:
    """skey_t: (B, T, 1, L), swords_t: (B, T, nw, L) halo'd tiles
    (L = TILE + KPAD).  Returns (B, T*TILE) u32 best len<<16|dist."""
    B, T, _, L = skey_t.shape
    base = _matcher_kernel_slice if _KERNEL_VARIANT == "slice" \
        else _matcher_kernel
    kern = functools.partial(base, K, nw)
    out = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, TILE), jnp.uint32),
        interpret=interpret,
    )(skey_t, swords_t, meta[:, None, :])
    return out.reshape(B, T * TILE)


def _pack_words(window: jnp.ndarray, nw: int) -> jnp.ndarray:
    """(B, W) bytes -> (B, W, nw) little-endian u32 carried words."""
    B, W = window.shape
    ext = jnp.concatenate(
        [window, jnp.zeros((B, 4 * nw + 4), window.dtype)], axis=1
    ).astype(jnp.uint32)
    planes = []
    for t in range(nw):
        w = jnp.zeros((B, W), jnp.uint32)
        for j in range(4):
            o = 4 * t + j
            w = w | (ext[:, o:o + W] << jnp.uint32(8 * j))
        planes.append(w)
    return jnp.stack(planes, axis=2)


def _halo_tiles(arr: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B, C, KPAD + T*TILE) -> (B, T, C, TILE+KPAD) overlapping tiles."""
    tiles = [arr[:, None, :, i * TILE: i * TILE + TILE + KPAD]
             for i in range(T)]
    return jnp.concatenate(tiles, axis=1)


def _candidate_pass(window, min_src_a, limit_a, *, K: int, nw: int,
                    hash_bytes: int, max_dist: int, interpret: bool):
    """One hash-bucket candidate scan: hash -> carried sort -> kernel ->
    unsort.  Returns best (len << 16 | dist) u32 per position."""
    B, W = window.shape
    T = -(-W // TILE)
    Wp = T * TILE

    h = _hashes14(window, hash_bytes)
    pos = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.uint32)[None, :], (B, W))
    key = (h << POS_BITS) | pos

    # carried-operand sort: the window words ride along with the keys so
    # no post-sort gather is needed (take_along_axis scalarizes on TPU)
    words = _pack_words(window, nw)                    # (B, W, nw)
    if hash_bytes < 4:
        # mask the trailing bytes so the equality scan can't credit
        # bytes beyond the hashed prefix
        mask = jnp.uint32((1 << (8 * hash_bytes)) - 1)
        words = jnp.concatenate(
            [words[:, :, :1] & mask, words[:, :, 1:]], axis=2)
    sorted_ops = jax.lax.sort(
        [key] + [words[:, :, t] for t in range(nw)],
        dimension=1, num_keys=1)
    skey = sorted_ops[0]
    spos = (skey & POS_MASK).astype(jnp.int32)
    swords = jnp.stack(sorted_ops[1:], axis=1)         # (B, nw, W)

    pad_tail = Wp - W
    # halo padding: sentinel keys decode to pos 0x3FFFF -> dist < 0 ->
    # never valid candidates
    skey_pad = jnp.pad(skey[:, None, :], ((0, 0), (0, 0),
                                          (KPAD, pad_tail)),
                       constant_values=np.uint32(0xFFFFFFFF))
    swords_pad = jnp.pad(swords, ((0, 0), (0, 0), (KPAD, pad_tail)))
    meta = jnp.stack([
        min_src_a, limit_a,
        jnp.full((B,), max_dist, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    ], axis=1)

    skey_t = _halo_tiles(skey_pad, T)                  # (B, T, 1, L)
    swords_t = _halo_tiles(swords_pad, T)              # (B, T, nw, L)
    best = _run_matcher(skey_t, swords_t, meta, K, nw,
                        interpret=interpret)[:, :W]

    # unsort: spos is a permutation of [0, W); sorting by it carries the
    # results back to position order without a scatter
    _, ld = jax.lax.sort([spos.astype(jnp.uint32), best],
                         dimension=1, num_keys=1)
    return ld


@functools.partial(jax.jit, static_argnames=("K", "nw", "hash_bytes", "ctx",
                                             "K3", "interpret"))
def find_matches_fused(window: jnp.ndarray, ctx_len: jnp.ndarray,
                       valid_len: jnp.ndarray, *, K: int, nw: int = 4,
                       hash_bytes: int = 4, ctx: int = mtc.CTX,
                       K3: int = 0, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (len, dist) per window position via the fused kernel.

    window: (B, W) uint8 = [ctx | shard] rows; ctx_len: valid context
    bytes per row; valid_len: real shard bytes per row (tail shards are
    zero-padded — positions beyond ctx+valid_len neither match nor serve
    as sources).  K3 > 0 adds a 3-byte-hash pass (K3 candidates, dist
    <= 4096 — deflate's too-far economy for short matches) like the
    reference's min-length chain entries.  Returns (mlen, mdist) int32.
    """
    B, W = window.shape
    min_src_a = (ctx - ctx_len).astype(jnp.int32)
    limit_a = (ctx + valid_len).astype(jnp.int32)

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

    # same-distance continuation chains extend past the carry cap
    mlen = runs.extend_chains(mlen, mdist, limit, cap=4 * nw,
                              interpret=interpret)

    drop = (mlen == consts.MIN_MATCH_LEN) & (mdist > 4096)
    mlen = jnp.where(drop, 0, mlen)
    mdist = jnp.where(drop, 0, mdist)
    return mlen, mdist
