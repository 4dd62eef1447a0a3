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
