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


LO = 32              # two-level split: sym = hi * LO + lo


def hist_onehot(sym: jnp.ndarray, w: jnp.ndarray, n: int) -> jnp.ndarray:
    """Weighted histogram: sym (B, S) int32 in [0, n), w (B, S) {0,1}.

    Returns (B, n) int32.  Padding positions must carry w == 0.

    For n > 64 the one-hot is split two-level (hi = sym/32, lo =
    sym%32): hist[hi, lo] accumulates as a per-chunk (G1, CH) x
    (CH, LO) matmul, so the materialized one-hots are (CH, G1 + LO)
    instead of (CH, n) — ~7x less HBM traffic at n = 288."""
    B, S = sym.shape
    sc = _chunked(sym)
    wc = _chunked(w.astype(jnp.int32))
    nc = sc.shape[1]

    if n > 64:
        G1 = -(-n // LO)
        iota_hi = jnp.arange(G1, dtype=jnp.int32)
        iota_lo = jnp.arange(LO, dtype=jnp.int32)

        def body2(i, acc):
            s = sc[:, i, :]
            hi, lo = s >> 5, s & 31
            oh_hi = (hi[:, :, None] == iota_hi).astype(jnp.bfloat16)
            oh_lo = ((lo[:, :, None] == iota_lo).astype(jnp.bfloat16)
                     * wc[:, i, :, None].astype(jnp.bfloat16))
            return acc + jnp.einsum(
                "bch,bcl->bhl", oh_hi, oh_lo,
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, nc, body2, jnp.zeros((B, G1, LO), jnp.float32))
        return acc.reshape(B, G1 * LO)[:, :n].astype(jnp.int32)

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

    Returns (B, S) uint32 == tab[b, sym[b, s]] via byte-plane matmuls.

    For n > 64: two-level — one (CH, LO) x (LO, G1*4) matmul gathers
    each position's 4 byte planes for EVERY hi-group sharing its lo
    index, then a (CH, G1) one-hot masked reduce picks the right
    group.  Materialization is (CH, LO + 5*G1) vs (CH, n)."""
    B, n = tab.shape
    S = sym.shape[1]
    sc = _chunked(sym)
    nc = sc.shape[1]

    if n > 64:
        G1 = -(-n // LO)
        npad = G1 * LO
        tabp = jnp.pad(tab, ((0, 0), (0, npad - n)))
        # (B, LO, G1*4): plane p of entry (hi, lo) at column hi*4+p
        planes2 = jnp.stack(
            [((tabp.reshape(B, G1, LO) >> jnp.uint32(8 * p))
              & jnp.uint32(0xFF)).astype(jnp.int32)
             for p in range(4)], axis=3)                # (B, G1, LO, 4)
        planes2 = planes2.transpose(0, 2, 1, 3).reshape(
            B, LO, G1 * 4).astype(jnp.bfloat16)
        iota_hi = jnp.arange(G1, dtype=jnp.int32)
        iota_lo = jnp.arange(LO, dtype=jnp.int32)

        def body2(i, out):
            s = sc[:, i, :]
            hi, lo = s >> 5, s & 31
            oh_lo = (lo[:, :, None] == iota_lo).astype(jnp.bfloat16)
            m1 = jnp.matmul(oh_lo, planes2,
                            preferred_element_type=jnp.float32)
            m1 = m1.reshape(B, CH, G1, 4)
            sel = (hi[:, :, None] == iota_hi)
            r = jnp.sum(jnp.where(sel[:, :, :, None], m1, 0.0), axis=2)
            ri = r.astype(jnp.uint32)                    # (B, CH, 4)
            word = (ri[:, :, 0] | (ri[:, :, 1] << 8) | (ri[:, :, 2] << 16)
                    | (ri[:, :, 3] << 24))
            return jax.lax.dynamic_update_slice(out, word, (0, i * CH))

        out = jax.lax.fori_loop(
            0, nc, body2, jnp.zeros((B, nc * CH), jnp.uint32))
        return out[:, :S]

    planes = jnp.stack(
        [((tab >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32)
         for p in range(4)], axis=2).astype(jnp.bfloat16)       # (B, n, 4)
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
