"""Device-side shard stream construction — fields, selection, histograms.

Builds, entirely on device, the per-shard (value, nbits) field sequence
whose LSB-first pack is the complete byte-aligned shard stream:

    [block header][body][EOB][sync-flush marker / final padding]

supporting all four shard representations (dynamic / fixed / literal-only
/ stored, incl. the 65535-byte stored-block split) selected per shard by
the exact bit-cost model.  Replaces the host planning + splicing loop of
round 1 (jx/pipeline.plan_shards / emit_shard).

Reference: block_writer.zig:307-433 (write + cost model),
deflate.zig:268-289 (flushTokens), :335-337 (flush sync marker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts, tables
from . import encode as enc
from . import header as hdr
from . import huff
from . import onehot

MAX_STORED = consts.MAX_STORED_BLOCK            # 65535

# fixed code tables as device constants
_FIX_LL_LENS = np.asarray(tables.FIXED_LITLEN_LENS[:consts.NUM_LITLEN],
                          dtype=np.int32)
_FIX_D_LENS = np.asarray(tables.FIXED_DIST_LENS[:consts.NUM_DIST],
                         dtype=np.int32)
_LEXTRA = np.zeros(consts.NUM_LITLEN, dtype=np.int32)
_LEXTRA[257:257 + 29] = tables.LENGTH_EXTRA_BITS
_DEXTRA = np.asarray(tables.DIST_EXTRA_BITS, dtype=np.int32)

KIND_DYN, KIND_FIX, KIND_LIT, KIND_STO = 0, 1, 2, 3


def _packed(codes: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    return codes.astype(jnp.uint32) | (lens.astype(jnp.uint32) << 24)


def slot_count(S: int) -> int:
    """Total field slots for a shard of S positions (padded to 512)."""
    n_mid = (S - 1) // MAX_STORED            # mid-stream stored headers
    raw = hdr.HDR_SLOTS + 2 * S + 2 * n_mid + 4
    return -(-raw // 512) * 512


def slot_count_compact(S: int) -> int:
    """Post-compaction bound: at most one live body field per position
    (every token start emits fa; fb is live only for matches, which
    consume >= 3 positions each, so fa+fb live counts stay <= S)."""
    n_mid = (S - 1) // MAX_STORED
    raw = hdr.HDR_SLOTS + S + 2 * n_mid + 4
    return -(-raw // 512) * 512


@functools.partial(jax.jit, static_argnames=("S",))
def build_fields(window_tail: jnp.ndarray, mlen: jnp.ndarray,
                 mdist: jnp.ndarray, starts: jnp.ndarray,
                 take: jnp.ndarray, valid_len: jnp.ndarray,
                 final: jnp.ndarray, S: int):
    """All-device stream planning for a batch of shards.

    window_tail (B, S) uint8: the shard bytes (no context);
    mlen/mdist/starts/take (B, S): parse results for the shard region;
    valid_len (B,): real bytes per shard; final (B,): last-shard flag.

    Returns (vals (B, SLOTS) u32, bits (B, SLOTS) i32, total_bits (B,),
    kind (B,)).
    """
    B = window_tail.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    live_pos = pos < valid_len[:, None]
    tok_start = starts & live_pos
    is_m = take & tok_start
    final = final.astype(jnp.int32)

    # ---- token symbols / extras (position order; no compaction) ----
    lcode = enc.length_code(jnp.maximum(mlen, 3))
    lev, leb = enc.length_extra(jnp.maximum(mlen, 3), lcode)
    dcode = enc.dist_code(jnp.maximum(mdist, 1))
    dev, deb = enc.dist_extra(jnp.maximum(mdist, 1), dcode)
    llsym = jnp.where(is_m, 257 + lcode, window_tail.astype(jnp.int32))
    llsym = jnp.where(tok_start, llsym, 0)
    dsym = jnp.where(is_m, dcode, 0)

    # ---- histograms (one-hot MXU matmuls; scatter-add scalarizes) ----
    hll = onehot.hist_onehot(jnp.where(tok_start, llsym, 0), tok_start,
                             consts.NUM_LITLEN)
    hll = hll.at[:, consts.END_OF_BLOCK].add(1)
    hdd = onehot.hist_onehot(dsym, is_m, consts.NUM_DIST)
    # byte histogram for the literal-only alternative
    hbyte = onehot.hist_onehot(
        jnp.where(live_pos, window_tail.astype(jnp.int32), 0), live_pos,
        consts.NUM_LITLEN)
    hbyte = hbyte.at[:, consts.END_OF_BLOCK].add(1)

    # ---- code construction (device package-merge) ----
    ll_lens = huff.pm_lengths(hll, consts.MAX_CODE_BITS)
    d_lens = huff.pm_lengths(hdd, consts.MAX_CODE_BITS)
    no_d = jnp.sum(d_lens, axis=1) == 0
    d_lens = jnp.where(no_d[:, None],
                       jnp.asarray([1] + [0] * (consts.NUM_DIST - 1),
                                   jnp.int32)[None, :], d_lens)
    lit_lens = huff.pm_lengths(hbyte, consts.MAX_CODE_BITS)
    d1 = jnp.asarray([1] + [0] * (consts.NUM_DIST - 1), jnp.int32)
    lit_d = jnp.broadcast_to(d1[None, :], (B, consts.NUM_DIST))

    dyn_hv, dyn_hb, dyn_hbits = hdr.build_headers(ll_lens, d_lens, final)
    lit_hv, lit_hb, lit_hbits = hdr.build_headers(lit_lens, lit_d, final)

    # ---- exact bit costs ----
    lext = jnp.asarray(_LEXTRA)[None, :]
    dext = jnp.asarray(_DEXTRA)[None, :]
    extras = jnp.sum(hll * lext, axis=1) + jnp.sum(hdd * dext, axis=1)
    dyn_cost = dyn_hbits + huff.coded_size(hll, ll_lens) \
        + huff.coded_size(hdd, d_lens) + extras
    fix_ll = jnp.asarray(_FIX_LL_LENS)[None, :]
    fix_d = jnp.asarray(_FIX_D_LENS)[None, :]
    fix_cost = 3 + huff.coded_size(hll, fix_ll) \
        + huff.coded_size(hdd, fix_d) + extras
    lit_cost = lit_hbits + huff.coded_size(hbyte, lit_lens)
    nblocks = jnp.maximum(1, -(-valid_len // MAX_STORED))
    sto_cost = 40 * nblocks + 8 * valid_len

    costs = jnp.stack([dyn_cost, fix_cost, lit_cost, sto_cost], axis=1)
    kind = jnp.argmin(costs, axis=1).astype(jnp.int32)
    k_dyn = (kind == KIND_DYN)[:, None]
    k_fix = (kind == KIND_FIX)[:, None]
    k_lit = (kind == KIND_LIT)[:, None]
    k_sto = (kind == KIND_STO)[:, None]

    # ---- selected code tables ----
    ll_sel_lens = jnp.where(k_dyn, ll_lens,
                            jnp.where(k_fix, fix_ll, lit_lens))
    d_sel_lens = jnp.where(k_dyn, d_lens, jnp.where(k_fix, fix_d, lit_d))
    ll_tab = _packed(huff.canonical_codes_dev(ll_sel_lens,
                                              consts.MAX_CODE_BITS),
                     ll_sel_lens)
    d_tab = _packed(huff.canonical_codes_dev(d_sel_lens,
                                             consts.MAX_CODE_BITS),
                    d_sel_lens)

    # ---- header region fields ----
    hv = jnp.where(k_dyn, dyn_hv, lit_hv)
    hb = jnp.where(k_dyn, dyn_hb, lit_hb)
    # fixed: single 3-bit field
    fix_hv = jnp.zeros_like(dyn_hv).at[:, 0].set(
        (final | (1 << 1)).astype(jnp.uint32))
    fix_hb = jnp.zeros_like(dyn_hb).at[:, 0].set(3)
    # stored: hdr(3) pad(5) len(16) nlen(16) in slots 0..3
    len1 = jnp.minimum(valid_len, MAX_STORED)
    sto_hv = jnp.zeros_like(dyn_hv)
    sto_hv = sto_hv.at[:, 0].set(jnp.where(nblocks == 1, final, 0
                                           ).astype(jnp.uint32))
    sto_hv = sto_hv.at[:, 2].set(len1.astype(jnp.uint32))
    sto_hv = sto_hv.at[:, 3].set((~len1 & 0xFFFF).astype(jnp.uint32))
    sto_hb = jnp.zeros_like(dyn_hb)
    sto_hb = sto_hb.at[:, 0].set(3).at[:, 1].set(5)
    sto_hb = sto_hb.at[:, 2].set(16).at[:, 3].set(16)
    hv = jnp.where(k_fix, fix_hv, jnp.where(k_sto, sto_hv, hv))
    hb = jnp.where(k_fix, fix_hb, jnp.where(k_sto, sto_hb, hb))

    # ---- body fields (2 per position) ----
    lle = onehot.lookup_onehot(ll_tab, jnp.where(tok_start, llsym, 0))
    dde = onehot.lookup_onehot(d_tab, dsym)
    llc, llb = lle & 0xFFFFFF, (lle >> 24).astype(jnp.int32)
    ddc, ddb = dde & 0xFFFFFF, (dde >> 24).astype(jnp.int32)
    # field a: litlen code + length extra (code low, extra high: LSB first)
    fa_tok_v = llc | (jnp.where(is_m, lev, 0).astype(jnp.uint32)
                      << llb.astype(jnp.uint32))
    fa_tok_b = jnp.where(tok_start, llb + jnp.where(is_m, leb, 0), 0)
    # field b: dist code + dist extra
    fb_tok_v = jnp.where(
        is_m, ddc | (dev.astype(jnp.uint32) << ddb.astype(jnp.uint32)), 0)
    fb_tok_b = jnp.where(is_m, ddb + deb, 0)
    # literal-only: every live byte coded with the selected table
    lit_e = onehot.lookup_onehot(ll_tab, window_tail.astype(jnp.int32))
    fa_lit_v = lit_e & 0xFFFFFF
    fa_lit_b = jnp.where(live_pos, (lit_e >> 24).astype(jnp.int32), 0)
    # stored: raw bytes
    fa_sto_v = window_tail.astype(jnp.uint32)
    fa_sto_b = jnp.where(live_pos, 8, 0)

    fa_v = jnp.where(k_sto, fa_sto_v, jnp.where(k_lit, fa_lit_v, fa_tok_v))
    fa_b = jnp.where(k_sto, fa_sto_b, jnp.where(k_lit, fa_lit_b, fa_tok_b))
    fb_v = jnp.where(k_sto | k_lit, 0, fb_tok_v)
    fb_b = jnp.where(k_sto | k_lit, 0, fb_tok_b)

    body_v = jnp.stack([fa_v, fb_v], axis=2).reshape(B, 2 * S)
    body_b = jnp.stack([fa_b, fb_b], axis=2).reshape(B, 2 * S)

    # insert mid-stream stored headers every MAX_STORED bytes
    n_mid = (S - 1) // MAX_STORED
    segs_v, segs_b = [], []
    cursor = 0
    for k in range(1, n_mid + 1):
        cut = 2 * k * MAX_STORED
        segs_v.append(body_v[:, cursor:cut])
        segs_b.append(body_b[:, cursor:cut])
        blk_start = k * MAX_STORED
        blk_live = k_sto[:, 0] & (valid_len > blk_start)
        blk_len = jnp.clip(valid_len - blk_start, 0, MAX_STORED)
        blk_final = jnp.where(valid_len <= (k + 1) * MAX_STORED, final, 0)
        # hdr(3)+pad(5)+len(16) then nlen(16)
        x1v = (jnp.where(blk_live, blk_final, 0).astype(jnp.uint32)
               | (blk_len.astype(jnp.uint32) << 8))
        x1b = jnp.where(blk_live, 24, 0)
        x2v = (~blk_len & 0xFFFF).astype(jnp.uint32)
        x2b = jnp.where(blk_live, 16, 0)
        segs_v.append(jnp.stack([x1v, x2v], axis=1))
        segs_b.append(jnp.stack([x1b, x2b], axis=1))
        cursor = cut
    segs_v.append(body_v[:, cursor:])
    segs_b.append(body_b[:, cursor:])
    body_v = jnp.concatenate(segs_v, axis=1)
    body_b = jnp.concatenate(segs_b, axis=1)

    # ---- trailer: EOB + sync-flush marker / final byte-align ----
    eob_e = ll_tab[:, consts.END_OF_BLOCK]
    eob_v = (eob_e & 0xFFFFFF).astype(jnp.uint32)
    eob_b = jnp.where(k_sto[:, 0], 0, (eob_e >> 24).astype(jnp.int32))

    bits_before = (jnp.sum(hb, axis=1) + jnp.sum(body_b, axis=1) + eob_b)
    is_final = final > 0
    # non-final: 3-bit empty-stored header + pad to byte + len/nlen
    pad_nf = 3 + ((-(bits_before + 3)) % 8)
    pad_f = (-bits_before) % 8
    m1_b = jnp.where(is_final, pad_f, pad_nf)
    m2_b = jnp.where(is_final, 0, 16)
    m3_b = jnp.where(is_final, 0, 16)
    m1_v = jnp.zeros((B,), jnp.uint32)
    m2_v = jnp.zeros((B,), jnp.uint32)
    m3_v = jnp.full((B,), 0xFFFF, jnp.uint32)

    trail_v = jnp.stack([eob_v, m1_v, m2_v, m3_v], axis=1)
    trail_b = jnp.stack([eob_b, m1_b, m2_b, m3_b], axis=1)

    SLOTS = slot_count(S)
    used = hdr.HDR_SLOTS + body_v.shape[1] + 4
    pad_slots = SLOTS - used
    vals = jnp.concatenate([
        hv, body_v, trail_v,
        jnp.zeros((B, pad_slots), jnp.uint32)], axis=1)
    bits = jnp.concatenate([
        hb, body_b, trail_b,
        jnp.zeros((B, pad_slots), jnp.int32)], axis=1)
    total_bits = jnp.sum(hb, axis=1) + jnp.sum(body_b, axis=1) \
        + jnp.sum(trail_b, axis=1)
    # dead fields must carry zero values — the packer ORs values verbatim
    vals = jnp.where(bits > 0, vals, 0)

    # compact live fields to the front via a stable carried sort so the
    # packer sees half the slots (live body fields are <= 1/position);
    # dead fields keep zero width, so the packed stream is unchanged
    idx = jnp.broadcast_to(
        jnp.arange(SLOTS, dtype=jnp.uint32)[None, :], (B, SLOTS))
    keys = jnp.where(bits > 0, idx, idx + jnp.uint32(1 << 20))
    _, vals_c, bits_c = jax.lax.sort(
        [keys, vals, bits], dimension=1, num_keys=1)
    SC = slot_count_compact(S)
    return vals_c[:, :SC], bits_c[:, :SC], total_bits, kind
