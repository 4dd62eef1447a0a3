"""One-hot matmul primitives — gather/scatter-free histograms and lookups.

XLA:TPU lowers `jnp.take_along_axis` / `.at[].add` over large arrays to
scalarized loops (~3.7 ns per element measured on this chip), which
made them the dominant cost of the stream-construction stage.  Both are
re-expressed as chunked one-hot matmuls that run on the MXU:

    hist[b, n]   = Σ_s w[b, s] · [sym[b, s] == n]
    out[b, s]    = Σ_n [sym[b, s] == n] · table[b, n]

Values are split into exact bf16 byte planes (every plane value ≤ 255,
integers ≤ 256 are exact in bf16; f32 accumulation is exact for the
magnitudes involved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CH = 2048            # positions per chunk; bounds one-hot materialization


def _chunked(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S) -> (B, S/CH, CH) with zero padding."""
    B, S = x.shape
    pad = (-S) % CH
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((B, pad), x.dtype)], axis=1)
    return x.reshape(B, -1, CH)


def hist_onehot(sym: jnp.ndarray, w: jnp.ndarray, n: int) -> jnp.ndarray:
    """Weighted histogram: sym (B, S) int32 in [0, n), w (B, S) {0,1}.

    Returns (B, n) int32.  Padding positions must carry w == 0."""
    B, S = sym.shape
    sc = _chunked(sym)
    wc = _chunked(w.astype(jnp.int32))
    nc = sc.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(i, acc):
        oh = (sc[:, i, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
        ww = wc[:, i, :].astype(jnp.bfloat16)[:, None, :]      # (B,1,CH)
        return acc + jnp.matmul(ww, oh,
                                preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((B, 1, n), jnp.float32))
    return acc[:, 0, :].astype(jnp.int32)


def lookup_onehot(tab: jnp.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """Per-row table lookup: tab (B, n) uint32, sym (B, S) int32.

    Returns (B, S) uint32 == tab[b, sym[b, s]] via byte-plane matmuls."""
    B, n = tab.shape
    S = sym.shape[1]
    planes = jnp.stack(
        [((tab >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
         for p in range(4)], axis=2).astype(jnp.bfloat16)       # (B, n, 4)
    sc = _chunked(sym)
    nc = sc.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(i, out):
        oh = (sc[:, i, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
        r = jnp.matmul(oh, planes,
                       preferred_element_type=jnp.float32)      # (B,CH,4)
        ri = r.astype(jnp.uint32)
        word = (ri[:, :, 0] | (ri[:, :, 1] << 8) | (ri[:, :, 2] << 16)
                | (ri[:, :, 3] << 24))
        return jax.lax.dynamic_update_slice(out, word, (0, i * CH))

    out = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((B, nc * CH), jnp.uint32))
    return out[:, :S]
