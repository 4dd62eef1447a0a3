"""Device-side shard stream construction — fields, selection, histograms.

Builds, entirely on device, the per-shard (value, nbits) field sequence
whose LSB-first pack is the complete byte-aligned shard stream:

    [block header][seg 0 body][boundary 1][seg 1 body]...[trailer]

A shard is divided into SEGMENTS (~32 per shard, parse-block aligned,
<= 65535 bytes).  Each live segment independently chooses raw (stored)
or coded representation by bit cost, so a shard mixing compressible and
incompressible spans emits zlib-style adaptive blocks: coded runs share
one Huffman table (trained on coded segments only, pass 2); stored runs
merge into stored blocks up to 65535 bytes.  The coded table family
(dynamic / fixed / literal-only) is chosen once per shard by the exact
bit-cost model; all-stored shards degenerate to pure stored runs.

Every shard ends with an empty stored block: the sync-flush marker for
non-final shards (byte-aligns the stream for splicing), and the BFINAL
block for the final shard (+5 bytes per member, one per stream).

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

# fixed code tables as device constants.  Lengths may be truncated to
# the emittable symbol range, but CODES must come from the FULL 288/32
# canonical assignment: dropping symbols 286-287 (two 8-bit codes)
# before assignment shifts every 9-bit code by 4 — bytes >= 144 then
# emit wrong-but-valid streams (r5 soak found this: tiny incompressible
# inputs are the only ones that pick fixed blocks AND contain them).
_FIX_LL_LENS = np.asarray(tables.FIXED_LITLEN_LENS[:consts.NUM_LITLEN],
                          dtype=np.int32)
_FIX_D_LENS = np.asarray(tables.FIXED_DIST_LENS[:consts.NUM_DIST],
                         dtype=np.int32)
_FIX_LL_PACKED = (tables.FIXED_LITLEN_CODES[:consts.NUM_LITLEN]
                  .astype(np.uint32)
                  | (_FIX_LL_LENS.astype(np.uint32) << 24))
_FIX_D_PACKED = (tables.FIXED_DIST_CODES[:consts.NUM_DIST]
                 .astype(np.uint32)
                 | (_FIX_D_LENS.astype(np.uint32) << 24))
_LEXTRA = np.zeros(consts.NUM_LITLEN, dtype=np.int32)
_LEXTRA[257:257 + 29] = tables.LENGTH_EXTRA_BITS
_DEXTRA = np.asarray(tables.DIST_EXTRA_BITS, dtype=np.int32)

KIND_DYN, KIND_FIX, KIND_LIT, KIND_STO = 0, 1, 2, 3

# stored-over-coded hysteresis (bits): a segment goes stored only when
# it saves at least this much, so reopen-header churn never loses bytes
_HYST = 192


def _packed(codes: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    return codes.astype(jnp.uint32) | (lens.astype(jnp.uint32) << 24)


def seg_size(S: int, blk: int = 1024) -> int:
    """Segment size: parse-block aligned, <= MAX_STORED, ~32/shard."""
    assert blk <= MAX_STORED
    nblk = -(-S // blk)
    target = blk * max(1, -(-nblk // 32))
    cap = (MAX_STORED // blk) * blk
    return min(target, cap)


def _nseg(S: int, seg: int) -> int:
    return -(-S // seg)


def slot_count(S: int, seg: int | None = None) -> int:
    """Total field slots for a shard of S positions (padded to 512)."""
    seg = seg or seg_size(S)
    raw = _nseg(S, seg) * (4 + hdr.HDR_SLOTS) + 2 * S + 4
    return -(-raw // 512) * 512


def slot_count_compact(S: int, seg: int | None = None) -> int:
    """Post-compaction bound: at most one live body field per position
    (every token start emits fa; fb is live only for matches, which
    consume >= 3 positions each, so fa+fb live counts stay <= S), plus
    boundary fields: <= 4 per boundary and one full header per block
    opening (at most every other segment can open a coded block)."""
    seg = seg or seg_size(S)
    ns = _nseg(S, seg)
    raw = S + 4 + ns * 4 + (ns // 2 + 1) * hdr.HDR_SLOTS
    return -(-raw // 512) * 512


def _entropy_bits(h: jnp.ndarray) -> jnp.ndarray:
    """Approximate Huffman code lengths from a histogram (B, n):
    -log2(p) + 0.35, clipped to [1, 15]; 0 where the symbol is absent.
    Used only for the per-segment stored/coded decision — emission uses
    exact package-merge tables."""
    total = jnp.maximum(1, h.sum(axis=1, keepdims=True)).astype(jnp.float32)
    p = h.astype(jnp.float32) / total
    bits = jnp.clip(-jnp.log2(jnp.maximum(p, 1e-9)) + 0.35, 1.0, 15.0)
    return jnp.where(h > 0, bits, 0.0)


@functools.partial(jax.jit, static_argnames=("S", "seg", "compact"))
def build_fields(window_tail: jnp.ndarray, mlen: jnp.ndarray,
                 mdist: jnp.ndarray, starts: jnp.ndarray,
                 take: jnp.ndarray, valid_len: jnp.ndarray,
                 final: jnp.ndarray, S: int, seg: int | None = None,
                 compact: bool = False):
    """All-device stream planning for a batch of shards.

    window_tail (B, S) uint8: the shard bytes (no context);
    mlen/mdist/starts/take (B, S): parse results for the shard region;
    valid_len (B,): real bytes per shard; final (B,): last-shard flag.
    seg: deflate-block segment size (parse-block aligned so no token
    crosses a boundary; crossings from foreign parses are detected and
    the affected boundary keeps one representation).

    Returns (vals (B, SLOTS) u32, bits (B, SLOTS) i32, total_bits (B,),
    kind (B,)).
    """
    if seg is None:
        seg = seg_size(S)
    nseg = _nseg(S, seg)
    P = nseg * seg
    MERGE = max(1, MAX_STORED // seg)
    B = window_tail.shape[0]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    live_pos = pos < valid_len[:, None]
    tok_start = starts & live_pos
    is_m = take & tok_start
    final = final.astype(jnp.int32)

    def segview(x):
        """(B, S) -> (B*nseg, seg), zero-padded."""
        if P > S:
            x = jnp.concatenate(
                [x, jnp.zeros((B, P - S), x.dtype)], axis=1)
        return x.reshape(B * nseg, seg)

    def segsum(x):
        return segview(x.astype(jnp.int32)).sum(axis=1).reshape(B, nseg)

    # ---- token symbols / extras (position order; no compaction) ----
    lcode = enc.length_code(jnp.maximum(mlen, 3))
    lev, leb = enc.length_extra(jnp.maximum(mlen, 3), lcode)
    dcode = enc.dist_code(jnp.maximum(mdist, 1))
    dev, deb = enc.dist_extra(jnp.maximum(mdist, 1), dcode)
    llsym = jnp.where(is_m, 257 + lcode, window_tail.astype(jnp.int32))
    llsym = jnp.where(tok_start, llsym, 0)
    dsym = jnp.where(is_m, dcode, 0)

    # ---- per-segment histograms (one-hot MXU matmuls) ----
    hll_seg = onehot.hist_onehot(
        segview(llsym), segview(tok_start), consts.NUM_LITLEN
    ).reshape(B, nseg, consts.NUM_LITLEN)
    hdd_seg = onehot.hist_onehot(
        segview(dsym), segview(is_m), consts.NUM_DIST
    ).reshape(B, nseg, consts.NUM_DIST)
    hbyte_seg = onehot.hist_onehot(
        segview(jnp.where(live_pos, window_tail.astype(jnp.int32), 0)),
        segview(live_pos), consts.NUM_LITLEN
    ).reshape(B, nseg, consts.NUM_LITLEN)
    extras_seg = segsum(jnp.where(is_m, leb + deb, 0))

    # ---- segment geometry ----
    seg_len_np = np.minimum(seg, S - seg * np.arange(nseg)).astype(np.int32)
    seg_start_np = (seg * np.arange(nseg)).astype(np.int32)
    live_bytes = jnp.clip(valid_len[:, None] - jnp.asarray(seg_start_np),
                          0, jnp.asarray(seg_len_np)[None, :])
    live_seg = live_bytes > 0

    # ---- pass 1: entropy-estimated coded cost -> stored decision ----
    hll_sum = hll_seg.sum(axis=1)
    hdd_sum = hdd_seg.sum(axis=1)
    ll_ebits = _entropy_bits(hll_sum)               # (B, 288)
    d_ebits = _entropy_bits(hdd_sum)
    coded_est = (
        jnp.einsum("bjs,bs->bj", hll_seg.astype(jnp.float32), ll_ebits)
        + jnp.einsum("bjs,bs->bj", hdd_seg.astype(jnp.float32), d_ebits)
        + extras_seg.astype(jnp.float32))
    stored_est = (8 * live_bytes + 40).astype(jnp.float32)
    want_stored = coded_est > stored_est + _HYST

    # tokens crossing a segment boundary (foreign, non-block-aligned
    # parses only) force both sides into one representation
    next_bnd = (pos // seg + 1) * seg
    crosses = segsum(is_m & (pos + mlen > next_bnd)) > 0   # (B, nseg)
    seg_stored = want_stored & live_seg
    cols = [seg_stored[:, 0]]
    for j in range(1, nseg):
        cols.append(jnp.where(crosses[:, j - 1] & live_seg[:, j],
                              cols[j - 1], seg_stored[:, j]))
    seg_stored = jnp.stack(cols, axis=1) & live_seg
    seg_coded = live_seg & ~seg_stored

    prev_coded = jnp.concatenate(
        [jnp.zeros((B, 1), bool), seg_coded[:, :-1]], axis=1)
    open_j = seg_coded & ~prev_coded
    nopen = open_j.sum(axis=1).astype(jnp.int32)

    # ---- pass 2: exact tables over coded segments only ----
    cmask = seg_coded[:, :, None]
    hll = jnp.where(cmask, hll_seg, 0).sum(axis=1)
    hdd = jnp.where(cmask, hdd_seg, 0).sum(axis=1)
    hbyte = jnp.where(cmask, hbyte_seg, 0).sum(axis=1)
    eobs = jnp.maximum(nopen, 1)
    hll = hll.at[:, consts.END_OF_BLOCK].add(eobs)
    hbyte = hbyte.at[:, consts.END_OF_BLOCK].add(eobs)
    extras = jnp.where(seg_coded, extras_seg, 0).sum(axis=1)

    ll_lens = huff.pm_lengths(hll, consts.MAX_CODE_BITS)
    d_lens = huff.pm_lengths(hdd, consts.MAX_CODE_BITS)
    no_d = jnp.sum(d_lens, axis=1) == 0
    d_lens = jnp.where(no_d[:, None],
                       jnp.asarray([1] + [0] * (consts.NUM_DIST - 1),
                                   jnp.int32)[None, :], d_lens)
    lit_lens = huff.pm_lengths(hbyte, consts.MAX_CODE_BITS)
    d1 = jnp.asarray([1] + [0] * (consts.NUM_DIST - 1), jnp.int32)
    lit_d = jnp.broadcast_to(d1[None, :], (B, consts.NUM_DIST))

    zeros_b = jnp.zeros((B,), jnp.int32)     # BFINAL always 0: the
    dyn_hv, dyn_hb, dyn_hbits = hdr.build_headers(ll_lens, d_lens, zeros_b)
    lit_hv, lit_hb, lit_hbits = hdr.build_headers(lit_lens, lit_d, zeros_b)

    # ---- shard-level coded-table-family selection (exact bit costs;
    # the stored-segment bits are a shared constant across dyn/fix/lit) ----
    stored_hdrs = jnp.where(
        seg_stored.any(axis=1),
        -(-jnp.where(seg_stored, live_bytes, 0).sum(axis=1)
          // (MERGE * seg)) + 1, 0)
    stored_const = 44 * stored_hdrs \
        + 8 * jnp.where(seg_stored, live_bytes, 0).sum(axis=1)
    dyn_cost = nopen * dyn_hbits + huff.coded_size(hll, ll_lens) \
        + huff.coded_size(hdd, d_lens) + extras + stored_const
    fix_ll = jnp.asarray(_FIX_LL_LENS)[None, :]
    fix_d = jnp.asarray(_FIX_D_LENS)[None, :]
    fix_cost = nopen * 3 + huff.coded_size(hll, fix_ll) \
        + huff.coded_size(hdd, fix_d) + extras + stored_const
    lit_cost = nopen * lit_hbits + huff.coded_size(hbyte, lit_lens) \
        + stored_const
    all_sto_hdrs = jnp.maximum(1, -(-valid_len // (MERGE * seg)))
    sto_cost = 44 * all_sto_hdrs + 8 * valid_len

    costs = jnp.stack([dyn_cost, fix_cost, lit_cost, sto_cost], axis=1)
    kind = jnp.argmin(costs, axis=1).astype(jnp.int32)
    k_dyn = (kind == KIND_DYN)[:, None]
    k_fix = (kind == KIND_FIX)[:, None]
    k_lit = (kind == KIND_LIT)[:, None]

    # all-stored shards: every live segment goes raw
    seg_stored = jnp.where((kind == KIND_STO)[:, None], live_seg, seg_stored)
    seg_coded = live_seg & ~seg_stored
    prev_coded = jnp.concatenate(
        [jnp.zeros((B, 1), bool), seg_coded[:, :-1]], axis=1)
    prev_stored = jnp.concatenate(
        [jnp.zeros((B, 1), bool), seg_stored[:, :-1]], axis=1)
    open_j = seg_coded & ~prev_coded
    close_j = prev_coded & seg_stored
    grid = np.arange(nseg) % MERGE == 0
    hdr_here = seg_stored & (~prev_stored | jnp.asarray(grid)[None, :])

    # merged stored-run byte cover per header (backward accumulation)
    covers = [None] * nseg
    nxt = jnp.zeros((B,), jnp.int32)
    for j in range(nseg - 1, -1, -1):
        if j + 1 < nseg:
            cont = seg_stored[:, j + 1] & ~hdr_here[:, j + 1]
            c = live_bytes[:, j] + jnp.where(cont, nxt, 0)
        else:
            c = live_bytes[:, j]
        covers[j] = c
        nxt = c
    cover = jnp.stack(covers, axis=1)

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
    # fixed blocks use the host-precomputed FULL-table codes: the
    # device canonical assignment over the truncated 286/30 lengths
    # would mis-place the 9-bit literal codes (see _FIX_LL_PACKED)
    ll_tab = jnp.where(k_fix, jnp.asarray(_FIX_LL_PACKED)[None, :],
                       ll_tab)
    d_tab = jnp.where(k_fix, jnp.asarray(_FIX_D_PACKED)[None, :], d_tab)

    # ---- selected block-header fields (replicated per opening) ----
    hv = jnp.where(k_dyn, dyn_hv, lit_hv)
    hb = jnp.where(k_dyn, dyn_hb, lit_hb)
    fix_hv = jnp.zeros_like(dyn_hv).at[:, 0].set(jnp.uint32(1 << 1))
    fix_hb = jnp.zeros_like(dyn_hb).at[:, 0].set(3)
    hv = jnp.where(k_fix, fix_hv, hv)
    hb = jnp.where(k_fix, fix_hb, hb)
    hbits_sel = jnp.sum(hb, axis=1)

    # ---- body fields (2 per position) ----
    stored_pos = jnp.repeat(seg_stored, seg, axis=1)[:, :S]
    lle = onehot.lookup_onehot(ll_tab, llsym)
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

    fa_cod_v = jnp.where(k_lit, fa_lit_v, fa_tok_v)
    fa_cod_b = jnp.where(k_lit, fa_lit_b, fa_tok_b)
    fa_v = jnp.where(stored_pos, window_tail.astype(jnp.uint32), fa_cod_v)
    fa_b = jnp.where(stored_pos, jnp.where(live_pos, 8, 0), fa_cod_b)
    fb_v = jnp.where(stored_pos | k_lit, 0, fb_tok_v)
    fb_b = jnp.where(stored_pos | k_lit, 0, fb_tok_b)

    body_v = jnp.stack([fa_v, fb_v], axis=2).reshape(B, 2 * S)
    body_b = jnp.stack([fa_b, fb_b], axis=2).reshape(B, 2 * S)
    body_bits_seg = segsum(fa_b + fb_b)

    # ---- boundary regions + running bit account (unrolled: nseg<=32) ----
    eob_e = ll_tab[:, consts.END_OF_BLOCK]
    eob_v = (eob_e & 0xFFFFFF).astype(jnp.uint32)
    eob_b = (eob_e >> 24).astype(jnp.int32)

    parts_v, parts_b = [], []
    bits_run = jnp.zeros((B,), jnp.int32)
    for j in range(nseg):
        cl, hh, op = close_j[:, j], hdr_here[:, j], open_j[:, j]
        s0_b = jnp.where(cl, eob_b, 0)
        bits_run = bits_run + s0_b
        pad = (-(bits_run + 3)) % 8
        s1_b = jnp.where(hh, 3 + pad, 0)
        s2_b = jnp.where(hh, 16, 0)
        bits_run = bits_run + jnp.where(hh, 35 + pad, 0)
        h_b = jnp.where(op[:, None], hb, 0)
        bits_run = bits_run + jnp.where(op, hbits_sel, 0)
        bits_run = bits_run + body_bits_seg[:, j]
        cov = cover[:, j]
        bnd_v = jnp.concatenate([
            jnp.stack([eob_v, jnp.zeros((B,), jnp.uint32),
                       cov.astype(jnp.uint32),
                       (~cov & 0xFFFF).astype(jnp.uint32)], axis=1),
            hv], axis=1)
        bnd_b = jnp.concatenate([
            jnp.stack([s0_b, s1_b, s2_b, s2_b], axis=1), h_b], axis=1)
        parts_v.append(bnd_v)
        parts_b.append(bnd_b)
        lo, hi = 2 * j * seg, min(2 * (j + 1) * seg, 2 * S)
        parts_v.append(body_v[:, lo:hi])
        parts_b.append(body_b[:, lo:hi])

    # ---- trailer: close the last coded block, then the empty stored
    # block that is the sync marker (BFINAL=0) or final block (BFINAL=1)
    last_live = jnp.clip(-(-valid_len // seg) - 1, 0, nseg - 1)
    last_coded = (valid_len > 0) & jnp.take_along_axis(
        seg_coded, last_live[:, None], axis=1)[:, 0]
    t_eob_b = jnp.where(last_coded, eob_b, 0)
    bits_run = bits_run + t_eob_b
    m1_b = 3 + (-(bits_run + 3)) % 8
    trail_v = jnp.stack([
        eob_v, final.astype(jnp.uint32), jnp.zeros((B,), jnp.uint32),
        jnp.full((B,), 0xFFFF, jnp.uint32)], axis=1)
    trail_b = jnp.stack([
        t_eob_b, m1_b, jnp.full((B,), 16, jnp.int32),
        jnp.full((B,), 16, jnp.int32)], axis=1)
    parts_v.append(trail_v)
    parts_b.append(trail_b)
    total_bits = bits_run + m1_b + 32

    vals = jnp.concatenate(parts_v, axis=1)
    bits = jnp.concatenate(parts_b, axis=1)
    SLOTS = slot_count(S, seg)
    pad_slots = SLOTS - vals.shape[1]
    assert pad_slots >= 0, (SLOTS, vals.shape)
    if pad_slots:
        vals = jnp.concatenate(
            [vals, jnp.zeros((B, pad_slots), jnp.uint32)], axis=1)
        bits = jnp.concatenate(
            [bits, jnp.zeros((B, pad_slots), jnp.int32)], axis=1)
    # dead fields must carry zero values — the packer ORs values verbatim
    vals = jnp.where(bits > 0, vals, 0)

    if not compact:
        # the packer's cost scales with slot count, but chip-measured the
        # 3-operand compaction sort (25.5 ms / 4 MiB batch) costs 4x the
        # extra pack time of the dead slots (~6 ms) — packing the full
        # slot grid wins
        return vals, bits, total_bits, kind

    # compact live fields to the front via a stable carried sort so the
    # packer sees ~half the slots; dead fields keep zero width, so the
    # packed stream is unchanged
    idx = jnp.broadcast_to(
        jnp.arange(SLOTS, dtype=jnp.uint32)[None, :], (B, SLOTS))
    keys = jnp.where(bits > 0, idx, idx + jnp.uint32(1 << 20))
    _, vals_c, bits_c = jax.lax.sort(
        [keys, vals, bits], dimension=1, num_keys=1)
    SC = slot_count_compact(S, seg)
    return vals_c[:, :SC], bits_c[:, :SC], total_bits, kind
