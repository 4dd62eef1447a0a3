"""Lazy/greedy token parse on device — batch-native pointer doubling.

The parse — "emit a token, jump its length, repeat" — is the one serially-
dependent step of the encode pipeline.  Pointer doubling resolves it in
log2(W) rounds of batched take_along_axis + one flattened scatter per
round.  The decision rule reproduces the spec (flate_tpu.deflate.
lazy_parse): a match is deferred when the next position holds a strictly
longer match and the current match is below the level's lazy threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts


def decide(mlen: jnp.ndarray, mdist: jnp.ndarray, lazy: bool,
           max_lazy: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position (take_match, step) under the one-step lazy rule.
    Arrays are (B, W)."""
    take = mlen >= consts.MIN_MATCH_LEN
    if lazy:
        nxt = jnp.concatenate(
            [mlen[:, 1:], jnp.zeros((mlen.shape[0], 1), mlen.dtype)], axis=1)
        defer = (nxt > mlen) & (mlen < max_lazy)
        take = take & ~defer
    step = jnp.where(take, jnp.maximum(mlen, 1), 1)
    return take, step


@functools.partial(jax.jit, static_argnames=("start", "lazy", "max_lazy"))
def parse_doubling(mlen: jnp.ndarray, mdist: jnp.ndarray,
                   start: int = 0, *,
                   lazy: bool = True, max_lazy: int = 32) -> jnp.ndarray:
    """Token-start mask via pointer doubling, batched (B, W) -> (B, W)."""
    B, N = mlen.shape
    take, step = decide(mlen, mdist, lazy, max_lazy)
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    nxt = jnp.minimum(idx + step.astype(jnp.int32), N)
    nxt = jnp.where(idx < start, jnp.minimum(idx + 1, N), nxt)

    on = jnp.zeros((B, N + 1), jnp.bool_).at[:, start].set(True)
    jump = jnp.concatenate([nxt, jnp.full((B, 1), N, jnp.int32)], axis=1)
    base = (jnp.arange(B, dtype=jnp.int32) * (N + 1))[:, None]
    rounds = max(1, (N - 1).bit_length())
    for _ in range(rounds):
        hits = jnp.where(on[:, :-1], jump[:, :-1], N)
        flat = (base + hits).reshape(-1)
        on = on.reshape(-1).at[flat].max(True).reshape(B, N + 1)
        jump = jnp.take_along_axis(jump, jump, axis=1)
    return on[:, :N] & (idx >= start)


# ---------------------------------------------------------------------------
# Pallas walk kernel — the parse is a short serial chain (one hop per
# token, ~N/4 hops typical); a scalar VMEM walk beats log2(N) rounds of
# full-size gather+scatter by ~50x on real hardware.
# ---------------------------------------------------------------------------

def _walk_kernel(step_ref, out_ref):
    R, L = out_ref.shape[-2], out_ref.shape[-1]
    N = R * L
    out_ref[...] = jnp.zeros_like(out_ref)

    def cond(i):
        return i < N

    def body(i):
        r = i // L
        c = i - r * L
        # Mosaic supports neither scalar VMEM stores nor dynamic lane
        # indexing: write via one-hot OR, read via masked reduction.
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) == c)
        row = out_ref[0, pl.ds(r, 1), :]
        out_ref[0, pl.ds(r, 1), :] = row | onehot.astype(jnp.int32)
        srow = step_ref[0, pl.ds(r, 1), :]
        s = jnp.sum(jnp.where(onehot, srow, 0))
        return i + s

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _parse_walk_pallas(step: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """step: (B, N) i32 jump sizes (context positions already excluded).
    Returns (B, N) bool token-start mask.  N must be a multiple of 1024
    (TPU tile constraint: blocks are reshaped to (N/128, 128))."""
    B, N = step.shape
    assert N % 1024 == 0, "shard length must be a multiple of 1024"
    R = N // 128
    step3 = step.reshape(B, R, 128)
    out = pl.pallas_call(
        _walk_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
        interpret=interpret,
    )(step3)
    return (out > 0).reshape(B, N)


# ---------------------------------------------------------------------------
# Block-local parallel parse — the production path.
#
# DEFLATE permits any valid tokenization, so the parse is made
# embarrassingly parallel by truncating matches at fixed block
# boundaries (one possibly-shortened token per block, ~0.1% size cost):
# with no token spanning a boundary, every block's walk is independent
# and runs as a vector lane.  Literal runs are skipped in one hop via a
# precomputed run-length table, so iterations ~ tokens-after-skipping,
# not positions.  Replaces the serial Pallas walk (~150 ms per 4 MiB)
# with ~10 ms of pure VPU work.
# ---------------------------------------------------------------------------

import os

PARSE_BLK = int(os.environ.get("FLATE_TPU_PARSE_BLK", "1024"))


def _runs_of_ones(x: jnp.ndarray, limit: int) -> jnp.ndarray:
    """cnt[i] = consecutive True starting at i (row-local, saturating)."""
    L, W = x.shape
    cnt = x.astype(jnp.int32)
    step = 1
    while step < limit:
        shifted = jnp.concatenate(
            [cnt[:, step:], jnp.zeros((L, step), jnp.int32)], axis=1)
        cnt = cnt + jnp.where(cnt == step, shifted, 0)
        step *= 2
    return cnt


@functools.partial(jax.jit, static_argnames=("start", "lazy", "max_lazy",
                                             "blk"))
def parse_blocks(mlen: jnp.ndarray, mdist: jnp.ndarray, start: int = 0, *,
                 lazy: bool = True, max_lazy: int = 32,
                 blk: int = PARSE_BLK) -> jnp.ndarray:
    """Token-start mask via block-local parallel walks; (B, W) -> (B, W).

    Matches are pre-truncated so none crosses a `blk` boundary past
    `start`; the caller must emit tokens with the same truncation rule
    (see truncate_matches)."""
    B, W = mlen.shape
    S = W - start
    assert S % blk == 0, "shard region must divide into parse blocks"
    # matches must already be truncated (truncate_matches) — idempotent,
    # so apply defensively here; XLA CSEs the duplicate when fused.
    mlen, mdist = truncate_matches(mlen, mdist, start, blk)
    take, step = decide(mlen, mdist, lazy, max_lazy)
    sub = step[:, start:].astype(jnp.int32)
    NB = S // blk
    L = B * NB
    sb = sub.reshape(L, blk)
    run1 = _runs_of_ones(sb == 1, blk)
    iota = jnp.arange(blk, dtype=jnp.int32)[None, :]

    def cond(state):
        cur, visited = state
        return jnp.any(cur < blk)

    def body(state):
        cur, visited = state
        oh = iota == cur[:, None]
        s = jnp.sum(jnp.where(oh, sb, 0), axis=1)
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
    _, visited = jax.lax.while_loop(cond, body, (cur0, vis0))
    starts_sub = visited.reshape(B, S)
    pad = jnp.zeros((B, start), jnp.bool_)
    return jnp.concatenate([pad, starts_sub], axis=1)


def truncate_matches(mlen: jnp.ndarray, mdist: jnp.ndarray, start: int,
                     blk: int = PARSE_BLK
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp match lengths so no match crosses a parse-block boundary.

    Boundaries sit at start + k*blk.  Lengths shrinking below the
    minimum become literals.  Must be applied before BOTH the parse and
    the field build so emitted tokens agree with the walk."""
    B, W = mlen.shape
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    rel = pos - start
    room = jnp.where(rel >= 0, blk - (rel % blk), jnp.int32(1 << 20))
    t = jnp.minimum(mlen, room)
    keep = t >= consts.MIN_MATCH_LEN
    return (jnp.where(keep, t, 0),
            jnp.where(keep, mdist, 0))


@functools.partial(jax.jit, static_argnames=("start", "lazy", "max_lazy",
                                             "interpret"))
def parse_walk(mlen: jnp.ndarray, mdist: jnp.ndarray, start: int = 0, *,
               lazy: bool = True, max_lazy: int = 32,
               interpret: bool = False) -> jnp.ndarray:
    """Pallas-walk version of parse_doubling; identical output contract."""
    B, W = mlen.shape
    take, step = decide(mlen, mdist, lazy, max_lazy)
    sub = step[:, start:].astype(jnp.int32)
    starts_sub = _parse_walk_pallas(sub, interpret)
    pad = jnp.zeros((B, start), jnp.bool_)
    return jnp.concatenate([pad, starts_sub], axis=1)
