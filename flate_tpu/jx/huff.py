"""Device-side length-limited Huffman planning — batched package-merge.

Replaces the host planning loop (one C/two-queue build per shard,
jx/pipeline.plan_shards) with a fully vectorized construction that runs
for the whole shard batch in one XLA program, so phase1 -> phase2 needs
no host round-trip.

Algorithm: package-merge (optimal length-limited prefix code), expressed
with fixed-shape arrays so it jits cleanly:

- lists are padded to M = 2n with +INF sentinels;
- each level's "merge sorted symbols with sorted packages" is one
  jnp.sort over keys (weight << 1 | is_package) — original symbols win
  weight ties, making the selection deterministic;
- the backward "how many items taken per level" pass is 15 scalar-ish
  steps over (B,) vectors;
- code length of the symbol with weight-rank r = #levels whose taken
  prefix covers r.

Reference counterpart: huffman_encoder.zig:62-278 (the serial Go/zlib
levels algorithm).  Host spec twin: flate_tpu.huffman (two-queue +
package-merge fallback).  Costs are provably equal (both optimal under
the limit); exact lengths may differ on ties, which the tests pin by
comparing total coded size and Kraft completeness instead of raw lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# weights must stay below INF; deflate shard histograms are < 2^18
# (np scalar, not jnp: a module-level jnp constant would initialize the
#  XLA backend at import, breaking jax.distributed.initialize)
INF = np.int32(1 << 21)
SYM_BITS = 9                      # alphabet <= 512 (largest is 286)


def _take1(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b] = arr[b, idx[b]] — one element per row."""
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("max_bits",))
def pm_lengths(freq: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """Optimal length-limited code lengths, batched.

    freq: (B, n) int32 frequencies (0 = unused symbol; values < 2^18).
    Returns (B, n) int32 code lengths (0 for unused; <= max_bits).
    """
    B, n = freq.shape
    freq = freq.astype(jnp.int32)
    active = freq > 0
    nact = jnp.sum(active.astype(jnp.int32), axis=1)

    sym = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    w = jnp.where(active, freq, INF)
    skey = jnp.sort((w << SYM_BITS) | sym, axis=1)
    ws = skey >> SYM_BITS                       # sorted weights, INF tail
    ssym = skey & ((1 << SYM_BITS) - 1)         # symbol of each rank

    # ---- forward: build lists, keep per-level original-prefix counts ----
    M = 2 * n
    pad = jnp.full((B, n), INF, jnp.int32)
    lw = jnp.concatenate([ws, pad], axis=1)                   # L_1, (B, M)
    lorig = jnp.concatenate(
        [jnp.ones((B, n), jnp.int32), jnp.zeros((B, n), jnp.int32)], axis=1)
    prefixes = [jnp.cumsum(lorig, axis=1)]
    for _level in range(2, max_bits + 1):
        pk = jnp.minimum(lw[:, 0::2] + lw[:, 1::2], INF)      # (B, n)
        merged = jnp.sort(
            jnp.concatenate([ws << 1, (pk << 1) | 1], axis=1), axis=1)
        lw = merged >> 1
        lorig = 1 - (merged & 1)
        prefixes.append(jnp.cumsum(lorig, axis=1))

    # ---- backward: taken-original counts per level ----
    m = jnp.maximum(2 * (nact - 1), 0)
    o_levels = []
    for level in range(max_bits, 1, -1):
        pre = prefixes[level - 1]
        o = jnp.where(m > 0, _take1(pre, jnp.maximum(m - 1, 0)), 0)
        o_levels.append(o)
        m = 2 * (m - o)
    o_levels.append(jnp.minimum(m, nact))       # level 1: all originals

    rank = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))
    len_by_rank = jnp.zeros((B, n), jnp.int32)
    for o in o_levels:
        len_by_rank = len_by_rank + (rank < o[:, None]).astype(jnp.int32)

    # unsort rank -> symbol (flattened scatter over (B, n) — tiny)
    base = (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
    flat = (base + ssym).reshape(-1)
    lens = jnp.zeros(B * n, jnp.int32).at[flat].set(
        len_by_rank.reshape(-1)).reshape(B, n)

    # single active symbol gets length 1; none -> all zero
    lens = jnp.where((nact == 1)[:, None], active.astype(jnp.int32), lens)
    return jnp.where(active, lens, 0)


def _rev16(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse a 16-bit value (vector, uint32)."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x & 0xAAAA) >> 1)
    x = ((x & 0x3333) << 2) | ((x & 0xCCCC) >> 2)
    x = ((x & 0x0F0F) << 4) | ((x & 0xF0F0) >> 4)
    x = ((x & 0x00FF) << 8) | ((x & 0xFF00) >> 8)
    return x


@functools.partial(jax.jit, static_argnames=("max_bits",))
def canonical_codes_dev(lens: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """Canonical codes from lengths, bit-reversed for LSB-first emission.

    lens: (B, n) int32.  Returns (B, n) uint32.  Matches
    tables.canonical_codes (RFC 1951 §3.2.2 assignment).
    """
    B, n = lens.shape
    lens = lens.astype(jnp.int32)
    # bl_count[l] and first-code-per-length via an unrolled 15-step scan
    code = jnp.zeros((B,), jnp.int32)
    codes = jnp.zeros((B, n), jnp.int32)
    prev_count = jnp.zeros((B,), jnp.int32)
    for l in range(1, max_bits + 1):
        mask = lens == l
        code = (code + prev_count) << 1
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        rank = cum - mask.astype(jnp.int32)      # rank within length class
        codes = jnp.where(mask, code[:, None] + rank, codes)
        prev_count = cum[:, -1]
    rev = _rev16(codes.astype(jnp.uint32))
    shift = (16 - jnp.maximum(lens, 1)).astype(jnp.uint32)
    return jnp.where(lens > 0, rev >> shift, 0).astype(jnp.uint32)


def packed_tables(lens: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """code | (len << 24) per symbol — the packer's table entry format."""
    codes = canonical_codes_dev(lens, max_bits)
    return codes | (lens.astype(jnp.uint32) << 24)


def coded_size(freq: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """(B,) total payload bits when coding freq rows with lens rows."""
    return jnp.sum(freq.astype(jnp.int32) * lens.astype(jnp.int32), axis=1)
