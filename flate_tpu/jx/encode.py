"""Device-side token encoding — batch-native compaction, histograms, pack.

Replaces the reference's serial writeTokens + BitWriter hot loop
(block_writer.zig:492-520, bit_writer.zig:63-79) with:

- arithmetic length/distance code computation (clz-based, gather-free);
- token compaction via per-row cumsum + one flattened scatter;
- per-shard litlen/dist histograms via one flattened scatter-add;
- bit-packing as an exclusive scan of field widths + scatter-add of <=2
  u32 words per field (every deflate field is <=15 bits wide).

All arrays are (B, ...); no vmap anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import consts

FIELDS = 4                       # litlen code, len extra, dist code, dist extra


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for x >= 1, via count-leading-zeros."""
    return 31 - jax.lax.clz(x.astype(jnp.int32))


def length_code(length: jnp.ndarray) -> jnp.ndarray:
    """Match length (3..258) -> length code index (0..28), arithmetically."""
    n = length - 3
    e = jnp.maximum(_floor_log2(jnp.maximum(n, 1)) - 2, 1)
    code = jnp.where(n < 8, n, (e << 2) + (n >> e))
    return jnp.where(n == 255, 28, code).astype(jnp.int32)


def length_extra(length: jnp.ndarray, code: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(extra value, extra bits) for a length code."""
    ebits = jnp.where((code < 8) | (code == 28), 0, (code >> 2) - 1)
    base = jnp.where(code < 8, code + 3, ((4 + (code & 3)) << ebits) + 3)
    base = jnp.where(code == 28, 258, base)
    return (jnp.maximum(length - base, 0)).astype(jnp.uint32), \
        ebits.astype(jnp.int32)


def dist_code(dist: jnp.ndarray) -> jnp.ndarray:
    """Distance (1..32768) -> distance code (0..29), arithmetically."""
    m = dist - 1
    e = _floor_log2(jnp.maximum(m, 1))
    code = jnp.where(m < 4, m, (e << 1) + ((m >> (e - 1)) & 1))
    return code.astype(jnp.int32)


def dist_extra(dist: jnp.ndarray, code: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    ebits = jnp.maximum((code >> 1) - 1, 0)
    base = jnp.where(code < 4, code + 1, ((2 + (code & 1)) << ebits) + 1)
    return (jnp.maximum(dist - base, 0)).astype(jnp.uint32), \
        ebits.astype(jnp.int32)


def compact_tokens(window: jnp.ndarray, mlen: jnp.ndarray,
                   mdist: jnp.ndarray, starts: jnp.ndarray,
                   take: jnp.ndarray) -> dict:
    """Compact parsed token streams into (B, MAXT) arrays (MAXT = shard
    length; tokens never outnumber shard bytes).  Slots beyond ntokens
    carry zero-width fields in the packer."""
    B, W = window.shape
    MAXT = W
    slot = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
    ntokens = slot[:, -1] + 1
    tgt = jnp.where(starts, slot, MAXT)               # dead slot per row
    base = (jnp.arange(B, dtype=jnp.int32) * (MAXT + 1))[:, None]
    flat = (base + tgt).reshape(-1)
    pos = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (B, W))

    def scat(vals, dtype):
        out = jnp.zeros(B * (MAXT + 1), dtype)
        out = out.at[flat].set(vals.reshape(-1).astype(dtype))
        return out.reshape(B, MAXT + 1)[:, :MAXT]

    is_m = scat(take & starts, jnp.bool_)
    tlen = scat(mlen, jnp.int32)
    tdist = scat(mdist, jnp.int32)
    tlit = scat(window, jnp.uint8)
    del pos

    live = jnp.arange(MAXT, dtype=jnp.int32)[None, :] < ntokens[:, None]
    is_m = is_m & live

    lcode = length_code(jnp.maximum(tlen, 3))
    lev, leb = length_extra(jnp.maximum(tlen, 3), lcode)
    dcode = dist_code(jnp.maximum(tdist, 1))
    dev, deb = dist_extra(jnp.maximum(tdist, 1), dcode)

    llsym = jnp.where(is_m, 257 + lcode, tlit.astype(jnp.int32))
    return {
        "ntokens": ntokens,
        "live": live,
        "is_match": is_m,
        "llsym": jnp.where(live, llsym, 0),
        "len_ev": lev, "len_eb": jnp.where(is_m, leb, 0),
        "dsym": dcode, "dist_ev": dev,
        "dist_eb": jnp.where(is_m, deb, 0),
    }


def histograms(tok: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 286) litlen freq incl. EOB and (B, 30) dist freq."""
    live = tok["live"]
    is_m = tok["is_match"]
    B, MAXT = live.shape
    base_ll = (jnp.arange(B, dtype=jnp.int32) * consts.NUM_LITLEN)[:, None]
    idx_ll = (base_ll + jnp.where(live, tok["llsym"],
                                  consts.END_OF_BLOCK)).reshape(-1)
    ll = jnp.zeros(B * consts.NUM_LITLEN, jnp.int32).at[idx_ll].add(
        live.reshape(-1).astype(jnp.int32)).reshape(B, consts.NUM_LITLEN)
    ll = ll.at[:, consts.END_OF_BLOCK].add(1)
    base_d = (jnp.arange(B, dtype=jnp.int32) * consts.NUM_DIST)[:, None]
    idx_d = (base_d + jnp.where(is_m, tok["dsym"], 0)).reshape(-1)
    dd = jnp.zeros(B * consts.NUM_DIST, jnp.int32).at[idx_d].add(
        is_m.reshape(-1).astype(jnp.int32)).reshape(B, consts.NUM_DIST)
    return ll, dd


def pack_tokens(tok: dict, ll_packed: jnp.ndarray, d_packed: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bit-pack token bodies for the whole batch.

    ll_packed/d_packed: (B, 286)/(B, 30) uint32 tables, entry =
    code | (nbits << 24), from the host Huffman build.  Returns
    (words (B, NWORDS) u32, total_bits (B,)); NWORDS covers the worst
    case (48 bits per token)."""
    is_m = tok["is_match"]
    live = tok["live"]
    B, MAXT = live.shape
    NWORDS = MAXT * 48 // 32 + 4

    lle = jnp.take_along_axis(ll_packed, tok["llsym"], axis=1)
    dde = jnp.take_along_axis(d_packed, tok["dsym"], axis=1)

    # every field is <= 15 bits wide: a field spans at most 2 u32 words
    vals = jnp.stack([
        (lle & 0xFFFFFF).astype(jnp.uint32),
        tok["len_ev"].astype(jnp.uint32),
        jnp.where(is_m, dde & 0xFFFFFF, 0).astype(jnp.uint32),
        tok["dist_ev"].astype(jnp.uint32),
    ], axis=2).reshape(B, MAXT * FIELDS)
    bits = jnp.stack([
        jnp.where(live, lle >> 24, 0).astype(jnp.int32),
        tok["len_eb"],
        jnp.where(is_m, dde >> 24, 0).astype(jnp.int32),
        tok["dist_eb"],
    ], axis=2).reshape(B, MAXT * FIELDS)

    end = jnp.cumsum(bits, axis=1)
    off = end - bits
    total_bits = end[:, -1]

    word = off >> 5
    sh = (off & 31).astype(jnp.uint32)
    v0 = vals << sh                       # u32 shift wraps mod 2^32
    v1 = jnp.where(sh == 0, 0,
                   vals >> ((jnp.uint32(32) - sh) & jnp.uint32(31)))

    word = jnp.where(bits == 0, NWORDS, word)   # dead fields -> dead slot
    base = (jnp.arange(B, dtype=jnp.int32) * (NWORDS + 2))[:, None]
    flat = (base + word).reshape(-1)
    out = jnp.zeros(B * (NWORDS + 2), jnp.uint32)
    out = out.at[flat].add(v0.reshape(-1))
    out = out.at[flat + 1].add(v1.reshape(-1))
    return out.reshape(B, NWORDS + 2)[:, :NWORDS], total_bits
