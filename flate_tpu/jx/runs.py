"""Pallas kernels for run-length helpers — VMEM-resident rounds.

The XLA formulations of the small-distance run search and the same-
distance chain extension each burn 35-45 ms per 4 MiB batch: every
doubling round materializes full (B, W) temporaries through HBM.  Here
each tile stays in VMEM across all rounds, so HBM sees the window once.

Tiles are (SUB, LANES) = (8, 1024) 2-D vregs in row-major flat order —
a (1, 8192) block runs every vector op at 1/8 sublane occupancy (chip-
measured; see match2.py).  Flat-order shifts across the 2-D layout are
lane-rolls plus a row-feed select: `shift_back(x, x_up, d)` reads flat
index p-d with row 0 fed from the neighbor row above, `shift_fwd` reads
p+j with the last row fed from below.  Neighbor tiles are passed as
extra BlockSpec views of the SAME (B, T+2, SUB, LANES) array (a pure
reshape of the padded window) — no overlapping halo copies through HBM.

Forward-reach kernels extend the tile with the next tile's first row
(a (SUB+1, LANES) VMEM concat); wrap garbage from the doubling rounds
stays confined to the extension row's tail, which the output never
reads (reach <= 511 < LANES).

Both kernels use the saturating static-shift doubling from jx/match.py
(associative_scan miscompiles on this TPU — see STATUS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

TILE = 8192
SUB = 8
LANES = TILE // SUB              # 1024
SMALL_DISTS = (1, 2, 3, 4, 8)
SCORE_SHIFT = 16


def lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def shift_back(x, x_up, d: int, lane):
    """Value at flat index p-d of a (R, LANES) row-major tile.
    x_up = x shifted down one row (row 0 fed from the row above the
    tile).  Requires 0 < d <= LANES."""
    a = pltpu.roll(x, d, 1)
    b = pltpu.roll(x_up, d, 1)
    return jnp.where(lane < d, b, a)


def shift_fwd(x, x_dn, j: int, lane):
    """Value at flat index p+j; x_dn = x shifted up one row (last row
    fed from the row below the tile).  Requires 0 < j <= LANES."""
    L = x.shape[1]
    a = pltpu.roll(x, L - j, 1)
    b = pltpu.roll(x_dn, L - j, 1)
    return jnp.where(lane >= L - j, b, a)


def _row_dn(x):
    """x shifted up one row; the wrapped last row is garbage that must
    stay confined to the extension-row tail (callers guarantee reach)."""
    return pltpu.roll(x, x.shape[0] - 1, 0)


def _sat_runs(eq: jnp.ndarray, limit: int, lane) -> jnp.ndarray:
    """In-register saturating run-length doubling in flat order over an
    extended (SUB+1, LANES) tile; exact wherever the composed reach
    (2*limit-1 flat positions) stays inside the extension."""
    cnt = eq
    step = 1
    while step <= limit:
        shifted = shift_fwd(cnt, _row_dn(cnt), step, lane)
        cnt = cnt + jnp.where(cnt == step, shifted, 0)
        step *= 2
    return cnt


def _small_runs_kernel(prv_ref, cur_ref, nxt_ref, meta_ref,
                       len_ref, dist_ref):
    cur = cur_ref[0, 0].astype(jnp.int32)              # (SUB, LANES)
    ext = jnp.concatenate(
        [cur, nxt_ref[0, 0, :1, :].astype(jnp.int32)], axis=0)
    lane = lane_iota(ext.shape)
    up = jnp.concatenate(
        [prv_ref[0, 0, SUB - 1:, :].astype(jnp.int32), ext[:-1, :]],
        axis=0)
    min_src = meta_ref[0, 0, 0, 0]
    limit = meta_ref[0, 0, 0, 1]
    tbase = meta_ref[0, 0, 0, 2]
    sub = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0)
    pos = tbase + sub * LANES + lane
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    best_len = jnp.zeros_like(ext)
    best_dist = jnp.zeros_like(ext)
    for d in SMALL_DISTS:
        prev = shift_back(ext, up, d, lane)            # w[x - d]
        eq = ((ext == prev) & (pos >= min_src + d)).astype(jnp.int32)
        cnt = _sat_runs(eq, consts.MAX_MATCH_LEN, lane)
        ln = jnp.minimum(jnp.minimum(cnt, consts.MAX_MATCH_LEN), maxlen)
        score_new = (ln << SCORE_SHIFT) - d
        score_old = (best_len << SCORE_SHIFT) - best_dist
        upd = (ln >= consts.MIN_MATCH_LEN) & \
            ((best_len == 0) | (score_new > score_old))
        best_len = jnp.where(upd, ln, best_len)
        best_dist = jnp.where(upd, d, best_dist)
    len_ref[0, 0] = best_len[:SUB, :]
    dist_ref[0, 0] = best_dist[:SUB, :]


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
    # zero tile on BOTH ends: block t-1 feeds the up row, t+1 the
    # extension row (zeros are inert: the min_src guard kills the left
    # edge, run counts of trailing zeros clamp at maxlen)
    wpad = jnp.pad(window, ((0, 0), (TILE, Wp - W + TILE)))
    tiles = wpad.reshape(B, T + 2, SUB, LANES)
    tb = jnp.arange(T, dtype=jnp.int32) * TILE
    meta = jnp.stack([
        jnp.broadcast_to(min_src[:, None], (B, T)),
        jnp.broadcast_to(limit[:, None], (B, T)),
        jnp.broadcast_to(tb[None, :], (B, T)),
        jnp.zeros((B, T), jnp.int32),
    ], axis=2)[:, :, None, :]                          # (B, T, 1, 4)

    spec = lambda off: pl.BlockSpec(                   # noqa: E731
        (1, 1, SUB, LANES), lambda b, t, o=off: (b, t + o, 0, 0),
        memory_space=pltpu.VMEM)
    blen, bdist = pl.pallas_call(
        _small_runs_kernel,
        grid=(B, T),
        in_specs=[
            spec(0), spec(1), spec(2),
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(spec(0), spec(0)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(tiles, tiles, tiles, meta)
    return (blen.reshape(B, Wp)[:, :W], bdist.reshape(B, Wp)[:, :W])


def _ext_inputs(x, B, T):
    """(B, W) -> (B, T+1, SUB, LANES) with a trailing zero tile."""
    W = x.shape[1]
    Wp = T * TILE
    xp = jnp.pad(x, ((0, 0), (0, Wp - W + TILE)))
    return xp.reshape(B, T + 1, SUB, LANES)


def _extend_kernel(cap: int, len_ref, lnx_ref, dist_ref, dnx_ref,
                   meta_ref, out_ref):
    l = jnp.concatenate([len_ref[0, 0], lnx_ref[0, 0, :1, :]], axis=0)
    d = jnp.concatenate([dist_ref[0, 0], dnx_ref[0, 0, :1, :]], axis=0)
    limit = meta_ref[0, 0, 0, 0]
    tbase = meta_ref[0, 0, 0, 1]
    lane = lane_iota(l.shape)
    sub = jax.lax.broadcasted_iota(jnp.int32, l.shape, 0)
    pos = tbase + sub * LANES + lane
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    nxt_d = shift_fwd(d, _row_dn(d), cap, lane)        # d[p + cap]
    chain = (l == cap) & (nxt_d == d) & (d > 0)
    total = l
    rounds = -(-consts.MAX_MATCH_LEN // cap) + 1
    for _ in range(rounds):
        nxt = shift_fwd(total, _row_dn(total), cap, lane)
        total = jnp.where(chain,
                          jnp.minimum(cap + nxt, 2 * consts.MAX_MATCH_LEN),
                          l)
    out = jnp.minimum(jnp.minimum(total, consts.MAX_MATCH_LEN), maxlen)
    out_ref[0, 0] = out[:SUB, :]


def _extend2_kernel(cap: int, l1_ref, l1n_ref, d1_ref, d1n_ref,
                    l2_ref, l2n_ref, d2_ref, d2n_ref, meta_ref,
                    out_ref):
    """Top-2 same-distance composition: a cap-saturated match at p with
    distance d continues through position p+cap when EITHER of p+cap's
    top-2 candidates has distance d — the chain survives the next
    position selecting a different best candidate (the failure mode
    that makes single-candidate chains break every `cap` bytes)."""
    def ext(c_ref, n_ref):
        return jnp.concatenate([c_ref[0, 0], n_ref[0, 0, :1, :]], axis=0)

    l1, d1 = ext(l1_ref, l1n_ref), ext(d1_ref, d1n_ref)
    l2, d2 = ext(l2_ref, l2n_ref), ext(d2_ref, d2n_ref)
    limit = meta_ref[0, 0, 0, 0]
    tbase = meta_ref[0, 0, 0, 1]
    lane = lane_iota(l1.shape)
    sub = jax.lax.broadcasted_iota(jnp.int32, l1.shape, 0)
    pos = tbase + sub * LANES + lane
    maxlen = jnp.clip(limit - pos, 0, consts.MAX_MATCH_LEN)

    nd1 = shift_fwd(d1, _row_dn(d1), cap, lane)
    nd2 = shift_fwd(d2, _row_dn(d2), cap, lane)
    c1a = (l1 == cap) & (nd1 == d1) & (d1 > 0)
    c1b = (l1 == cap) & ~c1a & (nd2 == d1) & (d1 > 0)
    c2a = (l2 == cap) & (nd1 == d2) & (d2 > 0)
    c2b = (l2 == cap) & ~c2a & (nd2 == d2) & (d2 > 0)
    t1, t2 = l1, l2
    rounds = -(-consts.MAX_MATCH_LEN // cap) + 1
    for _ in range(rounds):
        n1 = shift_fwd(t1, _row_dn(t1), cap, lane)
        n2 = shift_fwd(t2, _row_dn(t2), cap, lane)
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
    out_ref[0, 0] = out[:SUB, :]


def _ext_meta(limit, B, T):
    tb = jnp.arange(T, dtype=jnp.int32) * TILE
    return jnp.stack([
        jnp.broadcast_to(limit[:, None], (B, T)),
        jnp.broadcast_to(tb[None, :], (B, T)),
        jnp.zeros((B, T), jnp.int32),
        jnp.zeros((B, T), jnp.int32),
    ], axis=2)[:, :, None, :]                          # (B, T, 1, 4)


def _cur_spec():
    return pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t, 0, 0),
                        memory_space=pltpu.VMEM)


def _nxt_spec():
    return pl.BlockSpec((1, 1, SUB, LANES), lambda b, t: (b, t + 1, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def extend_chains2(l1, d1, l2, d2, limit: jnp.ndarray, cap: int,
                   interpret: bool = False):
    """Top-2 chain extension; returns (mlen, mdist) with the better of
    the two extended candidates per position."""
    B, W = l1.shape
    T = -(-W // TILE)
    Wp = T * TILE
    ins = []
    for x in (l1, d1, l2, d2):
        t = _ext_inputs(x, B, T)
        ins += [t, t]
    specs = [_cur_spec(), _nxt_spec()] * 4 + [
        pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.SMEM)]
    out = pl.pallas_call(
        functools.partial(_extend2_kernel, cap),
        grid=(B, T),
        in_specs=specs,
        out_specs=_cur_spec(),
        out_shape=jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.uint32),
        interpret=interpret,
    )(*ins, _ext_meta(limit, B, T))
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
    lt = _ext_inputs(mlen, B, T)
    dt = _ext_inputs(mdist, B, T)
    out = pl.pallas_call(
        functools.partial(_extend_kernel, cap),
        grid=(B, T),
        in_specs=[
            _cur_spec(), _nxt_spec(), _cur_spec(), _nxt_spec(),
            pl.BlockSpec((1, 1, 1, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=_cur_spec(),
        out_shape=jax.ShapeDtypeStruct((B, T, SUB, LANES), jnp.int32),
        interpret=interpret,
    )(lt, lt, dt, dt, _ext_meta(limit, B, T))
    return out.reshape(B, Wp)[:, :W]
