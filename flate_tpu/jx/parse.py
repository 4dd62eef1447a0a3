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
