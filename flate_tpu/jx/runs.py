"""Pallas kernels for run-length helpers — VMEM-resident rounds.

The XLA formulations of the small-distance run search and the same-
distance chain extension each burn 35-45 ms per 4 MiB batch: every
doubling round materializes full (B, W) temporaries through HBM.  Here
each tile stays in VMEM across all rounds, so HBM sees the window once.

Both kernels use the saturating static-shift doubling from jx/match.py
(associative_scan miscompiles on this TPU — see STATUS.md).  Halo
geometry: a position's result depends on at most the next 511 positions
(reads at distances 1+2+...+256), so a 512-entry right halo makes tiles
exact; `pltpu.roll` wrap-around garbage stays inside the halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

TILE = 8192
HALO = 640                   # right halo: 511-entry dependency + rounding
LH = 128                     # left halo: w[x-d] for tile-start positions
SMALL_DISTS = (1, 2, 3, 4, 8)
SCORE_SHIFT = 16


def _sat_runs(eq: jnp.ndarray, limit: int) -> jnp.ndarray:
    """In-register saturating run-length doubling along the lane axis.
    eq: (1, L) i32 in {0,1}; result exact for entries >= `limit` before
    the wrap-garbage region."""
    L = eq.shape[1]
    cnt = eq
    step = 1
    while step <= limit:
        shifted = pltpu.roll(cnt, L - step, 1)         # left shift by step
        cnt = cnt + jnp.where(cnt == step, shifted, 0)
        step *= 2
    return cnt


def _small_runs_kernel(win_ref, meta_ref, len_ref, dist_ref):
    w = win_ref[0, 0, :, :].astype(jnp.int32)          # (1, LH + TILE + HALO)
    L = w.shape[1]
    min_src = meta_ref[0, 0, 0, 0]
    limit = meta_ref[0, 0, 0, 1]
    tbase = meta_ref[0, 0, 0, 2]                          # tile origin position
    # lane i holds window position tbase - LH + i
    pos = (tbase - LH) + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    best_len = jnp.zeros_like(w)
    best_dist = jnp.zeros_like(w)
    for d in SMALL_DISTS:
        prev = pltpu.roll(w, d, 1)                     # w[x - d] (wraps left)
        eq = ((w == prev) & (pos >= min_src + d)).astype(jnp.int32)
        cnt = _sat_runs(eq, consts.MAX_MATCH_LEN)
        ln = jnp.minimum(jnp.minimum(cnt, consts.MAX_MATCH_LEN), maxlen)
        score_new = (ln << SCORE_SHIFT) - d
        score_old = (best_len << SCORE_SHIFT) - best_dist
        upd = (ln >= consts.MIN_MATCH_LEN) & \
            ((best_len == 0) | (score_new > score_old))
        best_len = jnp.where(upd, ln, best_len)
        best_dist = jnp.where(upd, d, best_dist)
    len_ref[0, 0, :, :] = best_len[:, LH:LH + TILE]
    dist_ref[0, 0, :, :] = best_dist[:, LH:LH + TILE]


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_dist_runs(window: jnp.ndarray, limit: jnp.ndarray,
                    min_src: jnp.ndarray, interpret: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas twin of match._small_dist_runs.

    window (B, W) u8; limit (B,) = ctx + valid_len (first invalid
    position); min_src (B,) = first valid source position.
    Returns (best_len, best_dist) (B, W) i32."""
    B, W = window.shape
    T = -(-W // TILE)
    Wp = T * TILE
    wpad = jnp.pad(window, ((0, 0), (LH, Wp - W + HALO)))
    tiles = jnp.concatenate(
        [wpad[:, None, None, t * TILE: t * TILE + LH + TILE + HALO]
         for t in range(T)], axis=1)                   # (B, T, 1, L)
    tb = jnp.arange(T, dtype=jnp.int32) * TILE
    meta = jnp.stack([
        jnp.broadcast_to(min_src[:, None], (B, T)),
        jnp.broadcast_to(limit[:, None], (B, T)),
        jnp.broadcast_to(tb[None, :], (B, T)),
        jnp.zeros((B, T), jnp.int32),
    ], axis=2)[:, :, None, :]                          # (B, T, 1, 4)

    L = LH + TILE + HALO
    blen, bdist = pl.pallas_call(
        _small_runs_kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, TILE), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TILE), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, 1, TILE), jnp.int32),
            jax.ShapeDtypeStruct((B, T, 1, TILE), jnp.int32),
        ),
        interpret=interpret,
    )(tiles, meta)
    return (blen.reshape(B, Wp)[:, :W], bdist.reshape(B, Wp)[:, :W])


def _extend_kernel(cap: int, len_ref, dist_ref, meta_ref, out_ref):
    l = len_ref[0, 0, :, :]                            # (1, L)
    d = dist_ref[0, 0, :, :]
    limit = meta_ref[0, 0, 0, 0]
    tbase = meta_ref[0, 0, 0, 1]
    L = l.shape[1]
    pos = tbase + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    nxt_d = pltpu.roll(d, L - cap, 1)                  # left shift by cap
    chain = (l == cap) & (nxt_d == d) & (d > 0)
    total = l
    rounds = -(-consts.MAX_MATCH_LEN // cap) + 1
    for _ in range(rounds):
        nxt = pltpu.roll(total, L - cap, 1)
        total = jnp.where(chain,
                          jnp.minimum(cap + nxt, 2 * consts.MAX_MATCH_LEN),
                          l)
    out = jnp.minimum(jnp.minimum(total, consts.MAX_MATCH_LEN), maxlen)
    out_ref[0, 0, :, :] = out[:, :TILE]


def _extend2_kernel(cap: int, l1_ref, d1_ref, l2_ref, d2_ref, meta_ref,
                    out_ref):
    """Top-2 same-distance composition: a cap-saturated match at p with
    distance d continues through position p+cap when EITHER of p+cap's
    top-2 candidates has distance d — the chain survives the next
    position selecting a different best candidate (the failure mode
    that makes single-candidate chains break every `cap` bytes)."""
    l1 = l1_ref[0, 0, :, :]
    d1 = d1_ref[0, 0, :, :]
    l2 = l2_ref[0, 0, :, :]
    d2 = d2_ref[0, 0, :, :]
    limit = meta_ref[0, 0, 0, 0]
    tbase = meta_ref[0, 0, 0, 1]
    L = l1.shape[1]
    pos = tbase + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    nd1 = pltpu.roll(d1, L - cap, 1)
    nd2 = pltpu.roll(d2, L - cap, 1)
    c1a = (l1 == cap) & (nd1 == d1) & (d1 > 0)
    c1b = (l1 == cap) & ~c1a & (nd2 == d1) & (d1 > 0)
    c2a = (l2 == cap) & (nd1 == d2) & (d2 > 0)
    c2b = (l2 == cap) & ~c2a & (nd2 == d2) & (d2 > 0)
    t1, t2 = l1, l2
    rounds = -(-consts.MAX_MATCH_LEN // cap) + 1
    for _ in range(rounds):
        n1 = pltpu.roll(t1, L - cap, 1)
        n2 = pltpu.roll(t2, L - cap, 1)
        v1 = jnp.minimum(cap + n1, 2 * consts.MAX_MATCH_LEN)
        v2 = jnp.minimum(cap + n2, 2 * consts.MAX_MATCH_LEN)
        t1 = jnp.where(c1a, v1, jnp.where(c1b, v2, l1))
        t2 = jnp.where(c2a, v1, jnp.where(c2b, v2, l2))
    t1 = jnp.minimum(jnp.minimum(t1, consts.MAX_MATCH_LEN), maxlen)
    t2 = jnp.minimum(jnp.minimum(t2, consts.MAX_MATCH_LEN), maxlen)
    s1 = jnp.where(t1 >= consts.MIN_MATCH_LEN,
                   (t1 << SCORE_SHIFT) - d1, -1)
    s2 = jnp.where(t2 >= consts.MIN_MATCH_LEN,
                   (t2 << SCORE_SHIFT) - d2, -1)
    pick2 = s2 > s1
    out_l = jnp.where(pick2, t2, t1)
    out_d = jnp.where(pick2, d2, d1)
    # the maxlen clip can shorten tail matches below MIN: drop them
    live = out_l >= consts.MIN_MATCH_LEN
    out_l = jnp.where(live, out_l, 0)
    out_d = jnp.where(live, out_d, 0)
    out = (out_l.astype(jnp.uint32) << 16) | out_d.astype(jnp.uint32)
    out_ref[0, 0, :, :] = out[:, :TILE]


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def extend_chains2(l1, d1, l2, d2, limit: jnp.ndarray, cap: int,
                   interpret: bool = False):
    """Top-2 chain extension; returns (mlen, mdist) with the better of
    the two extended candidates per position."""
    B, W = l1.shape
    T = -(-W // TILE)
    Wp = T * TILE

    def tile(x):
        xp = jnp.pad(x, ((0, 0), (0, Wp - W + HALO)))
        return jnp.concatenate(
            [xp[:, None, None, t * TILE: t * TILE + TILE + HALO]
             for t in range(T)], axis=1)

    tb = jnp.arange(T, dtype=jnp.int32) * TILE
    meta = jnp.stack([
        jnp.broadcast_to(limit[:, None], (B, T)),
        jnp.broadcast_to(tb[None, :], (B, T)),
        jnp.zeros((B, T), jnp.int32),
        jnp.zeros((B, T), jnp.int32),
    ], axis=2)[:, :, None, :]

    L = TILE + HALO
    out = pl.pallas_call(
        functools.partial(_extend2_kernel, cap),
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, 1, L), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)] * 4 + [
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, TILE), jnp.uint32),
        interpret=interpret,
    )(tile(l1), tile(d1), tile(l2), tile(d2), meta)
    ld = out.reshape(B, Wp)[:, :W]
    return (ld >> 16).astype(jnp.int32), (ld & 0xFFFF).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def extend_chains(mlen: jnp.ndarray, mdist: jnp.ndarray,
                  limit: jnp.ndarray, cap: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of match._extend_chains (same-distance composition).

    limit (B,) = first invalid position (maxlen computed in-kernel)."""
    B, W = mlen.shape
    T = -(-W // TILE)
    Wp = T * TILE

    def tile(x):
        xp = jnp.pad(x, ((0, 0), (0, Wp - W + HALO)))
        return jnp.concatenate(
            [xp[:, None, None, t * TILE: t * TILE + TILE + HALO]
             for t in range(T)], axis=1)

    tb = jnp.arange(T, dtype=jnp.int32) * TILE
    meta = jnp.stack([
        jnp.broadcast_to(limit[:, None], (B, T)),
        jnp.broadcast_to(tb[None, :], (B, T)),
        jnp.zeros((B, T), jnp.int32),
        jnp.zeros((B, T), jnp.int32),
    ], axis=2)[:, :, None, :]                          # (B, T, 1, 4)

    L = TILE + HALO
    out = pl.pallas_call(
        functools.partial(_extend_kernel, cap),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, L), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, TILE), jnp.int32),
        interpret=interpret,
    )(tile(mlen), tile(mdist), meta)
    return out.reshape(B, Wp)[:, :W]
