"""Device inflate — speculative parallel decode on TPU.

TPU-first re-derivation of the decode hot loop (reference:
inflate.zig:220-239, huffman_decoder.zig:71-175).  Three passes:

1. **Speculative symbol decode at every bit offset** (`_pass1`): pure
   vector arithmetic — no 2^15 flat tables.  Each position's 15-bit
   LSB-first window is bit-reversed and decoded with the canonical
   (Moffat–Turpin) threshold method: code length L = 1 + #{l : v >=
   lj_lim[l]} against 15 per-shard left-justified limits, symbol index =
   (v >> (15-L)) + kbase[L], symbol = a 288-entry per-shard gather.
   Chained fields (length extra, distance code, distance extra) read a
   staggered 48-bit window with data-dependent *shifts*, never gathers.
   Result: one packed u32 per bit position: adv(6) | kind(2) |
   value(8) | dist(15).

2. **True-path walk** (`_walk`, Pallas): the orbit of the body start
   through `adv` visits exactly the true symbol sequence; the kernel
   walks it serially in VMEM (one masked row-reduce per step, same mold
   as jx/parse._walk_kernel) and emits the *compacted* per-symbol words
   plus a count.  Speculative garbage at unvisited offsets is never
   touched.

3. **Parallel LZ resolution** (`_resolve`): per-symbol output spans via
   cumsum; every output byte gets a source pointer (literals point at
   themselves, match bytes at `start - dist + k % dist`, always strictly
   left); log2(n) rounds of pointer doubling land every byte on its
   originating literal.  Host-validated twin: parallel_inflate.py.

Shard boundaries come from the FLT1 index (an RFC1952 EXTRA subfield
written by pipeline2.compress_device2) so member decode is
embarrassingly parallel across shards; standard gzip tools ignore the
subfield.  Streams without an index use the host decoder.
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts, tables
from ..containers import Container, Hasher, parse_header, parse_footer
from ..errors import (
    InvalidBlockType,
    InvalidCode,
    WrongStoredBlockNlen,
)
from .. import inflate as hinf

CTX = consts.MAX_DISTANCE

K_LIT, K_MATCH, K_EOB, K_BAD = 0, 1, 2, 3

# FLT1 index lives in the host-only module (shared with pinflate)
from ..shard_index import (  # noqa: F401  (re-exported API)
    FLAG_INDEPENDENT,
    INDEX_SI,
    INDEX_VERSION,
    build_index_extra,
    parse_index_extra,
)


# ---------------------------------------------------------------------------
# Host-side per-shard planning: block header -> canonical scalars
# ---------------------------------------------------------------------------

def canonical_scalars(lens: np.ndarray, nsyms: int):
    """(lj_lims[16] u32, kbase[16] i32, syms[nsyms] i32) for the
    threshold decoder.  lens: per-symbol code lengths (0 = unused)."""
    lens = np.asarray(lens, np.int32)
    count = np.bincount(lens, minlength=16)[:16]
    count[0] = 0
    lims = np.zeros(16, np.uint32)
    kbase = np.zeros(16, np.int32)
    first = 0
    offset = 0
    for l in range(1, 16):
        first <<= 1
        kbase[l] = offset - first
        offset += int(count[l])
        first += int(count[l])
        lims[l] = min(first << (15 - l), 1 << 15)
    order = np.argsort(lens + (np.arange(len(lens)) + 1) * 16384 *
                       (lens == 0), kind="stable")
    live = int((lens > 0).sum())
    syms = np.zeros(nsyms, np.int32)
    syms[:live] = order[:live]
    return lims, kbase, syms


class ShardPlan:
    """One shard's decode plan: `stored` spans, `coded` scalars, or
    `mixed` (stored+coded blocks — segmented shard, host-decoded)."""

    __slots__ = ("kind", "stored_spans", "start_bit", "final",
                 "ll", "d", "out_len", "comp", "index")

    def __init__(self):
        self.kind = "coded"
        self.stored_spans = None


def plan_shard(comp: bytes, out_len: int) -> ShardPlan:
    """Parse the shard's block header(s) on host (tiny, serial-cheap).

    Shards are a run of stored blocks (`stored`), start with a coded
    block (`coded` — if more blocks follow, the device decode comes up
    short and the caller falls back), or mix stored-then-coded blocks
    (`mixed` — segmented shard, host-decoded)."""
    p = ShardPlan()
    p.out_len = out_len
    bits = hinf._BitCursor(comp)
    bfinal = bits.read(1)
    btype = bits.read(2)
    p.final = bfinal
    if btype == 0:
        spans = []
        bits.align_to_byte()
        while True:
            ln = bits.read(16)
            nlen = bits.read(16)
            if (ln ^ nlen) & 0xFFFF != 0xFFFF:
                raise WrongStoredBlockNlen("stored LEN/NLEN mismatch")
            spans.append((bits.pos >> 3, ln))
            bits.pos += ln * 8
            if bfinal or sum(s[1] for s in spans) >= out_len:
                break
            bfinal = bits.read(1)
            if bits.read(2) != 0:
                # stored-then-coded: segmented shard — host decode
                p.kind = "mixed"
                return p
            bits.align_to_byte()
        p.kind = "stored"
        p.stored_spans = spans
        return p
    if btype == 1:
        ll_lens = np.asarray(tables.FIXED_LITLEN_LENS, np.int32)
        d_lens = np.asarray(tables.FIXED_DIST_LENS, np.int32)
    elif btype == 2:
        ll_lens, d_lens = hinf.decode_dynamic_header_lens(bits)
        hinf.check_completeness(ll_lens, consts.MAX_CODE_BITS, True)
        hinf.check_completeness(d_lens, consts.MAX_CODE_BITS, False)
    else:
        raise InvalidBlockType(f"block type {btype}")
    p.start_bit = bits.pos
    p.ll = canonical_scalars(ll_lens, 288)
    p.d = canonical_scalars(d_lens, 32)
    return p


# ---------------------------------------------------------------------------
# Pass 1 — speculative decode at every bit offset (vector arithmetic)
# ---------------------------------------------------------------------------

def _rev15(v: jnp.ndarray) -> jnp.ndarray:
    v = ((v & 0x5555) << 1) | ((v >> 1) & 0x5555)
    v = ((v & 0x3333) << 2) | ((v >> 2) & 0x3333)
    v = ((v & 0x0F0F) << 4) | ((v >> 4) & 0x0F0F)
    v = ((v & 0x00FF) << 8) | ((v >> 8) & 0x00FF)
    return v >> 1


def _bit_windows32(comp: jnp.ndarray):
    """comp (B, C) u8 -> u (B, 8C) u32: u[p] = LSB-first bits [p, p+32).

    Built with 8 static-shift variants (one per bit-in-byte), no gathers."""
    B, C = comp.shape
    ext = jnp.concatenate(
        [comp, jnp.zeros((B, 13), comp.dtype)], axis=1).astype(jnp.uint32)
    dw = (ext[:, :C + 5] | (ext[:, 1:C + 6] << 8)
          | (ext[:, 2:C + 7] << 16) | (ext[:, 3:C + 8] << 24))
    b4 = ext[:, 4:C + 9]
    lanes = []
    for s in range(8):
        if s == 0:
            lanes.append(dw)
        else:
            lanes.append((dw >> np.uint32(s))
                         | (b4 << np.uint32(32 - s)))
    u = jnp.stack(lanes, axis=2)            # (B, C+5, 8)
    return u.reshape(B, -1)                  # (B, 8C+40)


def _field(u0, u1, u2, off, width_mask):
    """Extract `width<=15` bits at data-dependent offset off in [0, 36)
    from the staggered windows (u_k = bits [16k, 16k+32))."""
    rel = (off & 15).astype(jnp.uint32)
    k = off >> 4
    v0 = u0 >> rel
    v1 = u1 >> rel
    v2 = u2 >> rel
    v = jnp.where(k == 0, v0, jnp.where(k == 1, v1, v2))
    return v & width_mask


def _thresh_decode(v15, lims, kbase):
    """Canonical threshold decode: v15 (B, N) left-justified 15-bit
    values; lims/kbase (B, 16).  Returns (L (B,N) i32, idx (B,N) i32);
    L == 16 marks invalid codes."""
    L = jnp.ones_like(v15, dtype=jnp.int32)
    for l in range(1, 16):
        L = L + (v15 >= lims[:, l:l + 1]).astype(jnp.int32)
    kb = jnp.zeros_like(L)
    for l in range(1, 16):
        kb = jnp.where(L == l, kbase[:, l:l + 1], kb)
    idx = (v15 >> jnp.clip(15 - L, 0, 15).astype(jnp.uint32)
           ).astype(jnp.int32) + kb
    return L, idx


def _length_decode(li):
    """Arithmetic LENGTH_BASE / extra bits from length-code index li
    (0..28) — closed forms of tables.LENGTH_BASE/LENGTH_EXTRA_BITS."""
    e = jnp.maximum(li // 4 - 1, 0)
    base = ((4 + (li & 3)) << e.astype(jnp.uint32)) + 3
    base = jnp.where(li < 4, li + 3, base)
    base = jnp.where(li == 28, 258, base)
    eb = jnp.where((li < 4) | (li == 28), 0, e)
    return base, eb


def _dist_decode(di):
    """Arithmetic DIST_BASE / extra bits from distance-code index."""
    e = jnp.maximum(di // 2 - 1, 0)
    base = ((2 + (di & 1)) << e.astype(jnp.uint32)) + 1
    base = jnp.where(di < 2, di + 1, base)
    eb = jnp.where(di < 2, 0, e)
    return base, eb


def _pass1(comp, lims_ll, kbase_ll, syms_ll, lims_d, kbase_d, syms_d):
    """Packed speculative word per bit position:
    adv(6 bits, 0..48) | kind(2) << 6 | value(8) << 8 | (dist-1)(15) << 16.
    """
    B, C = comp.shape
    u = _bit_windows32(comp)
    N = 8 * C
    u0 = u[:, :N]
    u1 = jnp.concatenate([u[:, 16:], jnp.zeros((B, 16), u.dtype)],
                         axis=1)[:, :N]
    u2 = jnp.concatenate([u[:, 32:], jnp.zeros((B, 32), u.dtype)],
                         axis=1)[:, :N]

    v15 = _rev15(u0 & 0x7FFF)
    L, idx = _thresh_decode(v15, lims_ll, kbase_ll)
    bad = L > 15
    idx = jnp.clip(idx, 0, syms_ll.shape[1] - 1)
    # MXU one-hot lookup: take_along_axis scalarizes (~3.7 ns/elem) and
    # was 135 of the 185 ms decode batch (r5 chip profile)
    from . import onehot
    sym = onehot.lookup_onehot(syms_ll.astype(jnp.uint32),
                               idx).astype(jnp.int32)

    is_lit = (sym < 256) & ~bad
    is_eob = (sym == 256) & ~bad
    is_m = (sym > 256) & ~bad
    li = jnp.clip(sym - 257, 0, 28)
    bad |= (sym > 256) & (sym - 257 > 28)
    lbase, leb = _length_decode(li)
    lev = _field(u0, u1, u2, L, jnp.uint32(0x1FFF)) \
        & ((jnp.uint32(1) << leb.astype(jnp.uint32)) - 1)
    length = lbase + lev.astype(jnp.int32)

    o2 = L + leb
    vd15 = _rev15(_field(u0, u1, u2, o2, jnp.uint32(0x7FFF)))
    Ld, idxd = _thresh_decode(vd15, lims_d, kbase_d)
    bad |= is_m & (Ld > 15)
    idxd = jnp.clip(idxd, 0, syms_d.shape[1] - 1)
    dsym = onehot.lookup_onehot(syms_d.astype(jnp.uint32),
                                idxd).astype(jnp.int32)
    bad |= is_m & (dsym > 29)
    di = jnp.clip(dsym, 0, 29)
    dbase, deb = _dist_decode(di)
    o3 = o2 + Ld
    dev = _field(u0, u1, u2, o3, jnp.uint32(0x1FFF)) \
        & ((jnp.uint32(1) << deb.astype(jnp.uint32)) - 1)
    dist = dbase + dev.astype(jnp.int32)

    adv = jnp.where(is_m, o3 + deb, L)
    kind = jnp.where(bad, K_BAD,
                     jnp.where(is_eob, K_EOB,
                               jnp.where(is_m, K_MATCH, K_LIT)))
    value = jnp.where(is_m, length - 3, sym & 0xFF)
    adv = jnp.where(bad, 1, adv)
    word = (adv.astype(jnp.uint32)
            | (kind.astype(jnp.uint32) << 6)
            | (value.astype(jnp.uint32) << 8)
            | (jnp.where(is_m, dist - 1, 0).astype(jnp.uint32) << 16))
    return word


# ---------------------------------------------------------------------------
# Pass 2 — Pallas walk: visit true symbol starts, emit compacted words
# ---------------------------------------------------------------------------

def _walk_kernel(word_ref, meta_ref, out_ref, cnt_ref):
    NSR, LW = out_ref.shape[-2], out_ref.shape[-1]
    NS = NSR * LW
    out_ref[...] = jnp.zeros_like(out_ref)
    start = meta_ref[0, 0, 0]
    n = meta_ref[0, 0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LW), 1)

    def cond(c):
        cur, k = c
        return (cur < n) & (k < NS)

    def body(c):
        cur, k = c
        r = cur // LW
        col = cur - r * LW
        onehot = lane == col
        row = word_ref[0, pl.ds(r, 1), :]
        # Mosaic can't reduce unsigned ints — sum in i32, bit-identical
        w = jnp.sum(jnp.where(onehot, row, 0).astype(jnp.int32)
                    ).astype(jnp.uint32)
        kr = k // LW
        kc = k - kr * LW
        koh = lane == kc
        orow = out_ref[0, pl.ds(kr, 1), :]
        out_ref[0, pl.ds(kr, 1), :] = orow | jnp.where(
            koh, w, 0).astype(jnp.uint32)
        kindv = (w >> 6) & 3
        nxt = jnp.where(kindv == K_EOB, n,
                        cur + (w & 63).astype(jnp.int32))
        return nxt, k + 1

    _, k = jax.lax.while_loop(cond, body, (start, jnp.int32(0)))
    cnt_ref[0, 0, 0] = k


def _walk(word: jnp.ndarray, start: jnp.ndarray, nbits: jnp.ndarray,
          NS: int, interpret: bool):
    """word (B, N) u32 -> (symbol words (B, NS) u32, counts (B,))."""
    B, N = word.shape
    assert N % 1024 == 0 and NS % 128 == 0
    meta = jnp.stack([start.astype(jnp.int32), nbits.astype(jnp.int32)],
                     axis=1)[:, None, :]
    out, cnt = pl.pallas_call(
        _walk_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NS // 128, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NS // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(word.reshape(B, N // 128, 128), meta)
    return out.reshape(B, NS), cnt[:, 0, 0]


import jax.experimental.pallas as pl  # noqa: E402  (used above in specs)
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


# ---------------------------------------------------------------------------
# Pass 2 (v2) — speculative multi-lane walk with in-kernel join resolve
#
# The serial `_walk` visits one true symbol per while_loop step (~30K
# steps per 128 KiB shard — the round-2 device-inflate bottleneck).
# Here the bitstream is cut into NL lanes of G bits; every lane walks
# the adv-chain from its base concurrently (same mold as
# parse.parse_blocks), so steps ~ symbols-per-lane, not per-shard.
# A lane that starts mid-symbol self-synchronizes: its chain and the
# true chain are both strictly increasing ~9-bit steps, so they collide
# within a few symbols (rapidgzip's observation; SURVEY §7 step 5).
# Exactness is restored by the JOIN phase: the true chain enters lane l
# at the previous lane's exit and is walked at most J steps until it
# lands on a lane-visited position; from there the lane's own chain IS
# the true chain (positions are strictly increasing, so the visited set
# from any member onward is exactly the chain suffix).  Lanes whose join
# fails (possible but rare) flag the shard for host fallback — never
# wrong bytes, at worst a slower path.
#
# Reference hot loop being replaced: inflate.zig:220-239.
# ---------------------------------------------------------------------------

LANE_G = 2048                    # lane width in bits
LANE_J = 96                      # max join-walk steps


def _lane_walk_kernel(G: int, J: int, word_ref, meta_ref,
                      mask_ref, joined_ref, vis_ref):
    """Grid (B,).  word_ref (1, NL, G) i32 spec words; meta (1, 1, 2)
    SMEM = (start_bit, nbits).  Outputs: mask (1, NL, G) i32 true-chain
    membership, joined (1, NL, 128) i32 lane-join flags (col 0)."""
    NL = word_ref.shape[1]
    word = word_ref[0]                                  # (NL, G)
    nxt_row = pltpu.roll(word, NL - 1, 0)               # row l -> row l+1
    # the 64-word halo (next lane's head) is read via a SECOND masked
    # lookup instead of a concat: Mosaic cannot concatenate the rolled
    # operand (offset layout mismatch on the non-concat dim — the chip
    # crash BENCH_r03 recorded; round-4 fix)
    s0 = meta_ref[0, 0, 0]
    n = meta_ref[0, 0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (NL, 1), 0)
    lbase = lane * G
    colG = jax.lax.broadcasted_iota(jnp.int32, (NL, G), 1)
    l0 = s0 // G

    def read_at(c):
        """word at in-lane offset c (scalar per lane, may be >= G: the
        next lane's first 64 words serve as lookahead halo)."""
        m = jnp.sum(jnp.where(colG == c, word, 0), axis=1, keepdims=True)
        h = jnp.sum(jnp.where(colG == c - G, nxt_row, 0), axis=1,
                    keepdims=True)
        return m + h

    # ---- phase 1: speculative walk from every lane base --------------
    # (the start lane walks from the exact start; earlier lanes and
    # lanes past the stream are inactive)
    cur0 = jnp.where(lane == l0, s0 - lbase, 0)
    cur0 = jnp.where((lane < l0) | (lbase >= n), G, cur0)
    vis_ref[...] = jnp.zeros_like(vis_ref)

    def p1_cond(c):
        return jnp.any(c < G)

    def p1_body(c):
        vis_ref[0] = vis_ref[0] | jnp.where(
            (colG == c) & (c < G), 1, 0)
        w = read_at(c)
        adv = jnp.maximum(w & 63, 1)
        return jnp.where(c < G, c + adv, c)

    exit_rel = jax.lax.while_loop(p1_cond, p1_body, cur0)  # (NL, 1)

    # ---- phase 2: join the true chain onto each lane's chain ---------
    # entry of lane l = exit of lane l-1 (relative: exit_rel - G); the
    # start lane enters at the exact start and joins at step 0.
    ent = pltpu.roll(exit_rel, 1, 0) - G
    ent = jnp.where(lane == l0, s0 - lbase, ent)
    vis = vis_ref[0]

    def p2_body(_, st):
        # `joined` is carried as i32 (0/1): Mosaic fails to legalize
        # vector<i1> loop carries (scf.for legalization — the second
        # form of the round-3 chip crash)
        c2, joined, jpos, jmask = st
        on_vis = jnp.sum(jnp.where(colG == c2, vis, 0), axis=1,
                         keepdims=True) > 0
        hit = on_vis & (joined == 0) & (c2 < G)
        jpos = jnp.where(hit, c2, jpos)
        joined = jnp.where(hit, 1, joined)
        live = (joined == 0) & (c2 < G)
        jmask = jmask | jnp.where((colG == c2) & live, 1, 0)
        w = read_at(c2)
        adv = jnp.maximum(w & 63, 1)
        c2 = jnp.where(live, c2 + adv, c2)
        return c2, joined, jpos, jmask

    vac = (lane < l0) | (lbase >= n)                    # vacuous lanes
    st0 = (ent, vac.astype(jnp.int32), jnp.full((NL, 1), G, jnp.int32),
           jnp.zeros((NL, G), jnp.int32))
    _, joined_i, jpos, jmask = jax.lax.fori_loop(0, J, p2_body, st0)
    joined = joined_i > 0

    mask_ref[0] = jmask | jnp.where(
        (colG >= jpos) & joined & ~vac, vis, 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (NL, 128), 1)
    joined_ref[0] = jnp.where(jcol == 0, joined_i, 0)


@functools.partial(jax.jit, static_argnames=("G", "J", "interpret"))
def _lane_walk(word: jnp.ndarray, start: jnp.ndarray, nbits: jnp.ndarray,
               *, G: int = LANE_G, J: int = LANE_J,
               interpret: bool = False):
    """word (B, N) u32 -> (mask (B, N) bool, joined (B, NL) bool)."""
    B, N = word.shape
    assert N % G == 0 and G % 128 == 0
    NL = N // G
    meta = jnp.stack([start.astype(jnp.int32), nbits.astype(jnp.int32)],
                     axis=1)[:, None, :]
    mask, joined = pl.pallas_call(
        functools.partial(_lane_walk_kernel, G, J),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NL, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, NL, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NL, G), jnp.int32),
            jax.ShapeDtypeStruct((B, NL, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((1, NL, G), jnp.int32)],
        interpret=interpret,
    )(word.astype(jnp.int32).reshape(B, NL, G), meta)
    return (mask.reshape(B, N) > 0), (joined[:, :, 0] > 0)


def _extract(word: jnp.ndarray, mask: jnp.ndarray, joined: jnp.ndarray,
             start: jnp.ndarray, NS: int, G: int = LANE_G):
    """Compact the true-chain words into slot order and locate the EOB.

    Returns (words (B, NS) u32, counts (B,) incl. EOB, spec_fail (B,),
    has_eob (B,), out_len (B,), end_bit (B,)).  spec_fail marks shards
    whose lane chain is unproven up to the EOB (join failure) —
    retryable exactly, NOT a stream error.  out_len/end_bit let callers
    decode spans whose output size and bit extent are unknown upfront
    (arbitrary-stream chaining)."""
    B, N = word.shape
    pos = jnp.arange(N, dtype=jnp.uint32)[None, :]
    key = jnp.where(mask, pos, jnp.uint32(0xFFFFFFFF))
    skey, sw = jax.lax.sort([key, word], dimension=1, num_keys=1)
    keys_c, words_c = skey[:, :NS], sw[:, :NS]
    kind = ((words_c >> 6) & 3).astype(jnp.int32)
    is_eob = (kind == K_EOB) & (keys_c != jnp.uint32(0xFFFFFFFF))
    has_eob = jnp.any(is_eob, axis=1)
    eob_idx = jnp.argmax(is_eob, axis=1).astype(jnp.int32)
    counts = eob_idx + 1
    eob_i = eob_idx[:, None]
    p_eob = jnp.take_along_axis(keys_c, eob_i, axis=1)[:, 0]\
        .astype(jnp.int32)
    w_eob = jnp.take_along_axis(words_c, eob_i, axis=1)[:, 0]
    end_bit = p_eob + (w_eob & 63).astype(jnp.int32)
    # output bytes of the true symbols before the EOB
    slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
    live = slots < (counts[:, None] - 1)
    value = ((words_c >> 8) & 0xFF).astype(jnp.int32)
    olen = jnp.where(live & (kind == K_MATCH), value + 3,
                     jnp.where(live & (kind == K_LIT), 1, 0))
    out_len = jnp.sum(olen, axis=1)
    # every lane from the start lane through the EOB lane must be joined
    NL = N // G
    lanes = jnp.arange(NL, dtype=jnp.int32)[None, :]
    l0 = (start // G).astype(jnp.int32)[:, None]
    le = (p_eob // G)[:, None]
    lane_ok = joined | (lanes < l0) | (lanes > le)
    spec_fail = ~jnp.all(lane_ok, axis=1) | ~has_eob
    return words_c, counts, spec_fail, has_eob, out_len, end_bit


@functools.partial(jax.jit, static_argnames=("S", "NS", "G", "interpret"))
def decode_batch2(comp, clen, start, lims_ll, kbase_ll, syms_ll,
                  lims_d, kbase_d, syms_d, out_lens, ctx0, *,
                  S: int, NS: int, G: int = LANE_G,
                  interpret: bool = False):
    """Lane-walk twin of decode_batch; extra return: spec_fail (B,)."""
    word = _pass1(comp, lims_ll, kbase_ll, syms_ll,
                  lims_d, kbase_d, syms_d)
    mask, joined = _lane_walk(word, start, 8 * clen, G=G,
                              interpret=interpret)
    words, counts, spec_fail, _, _, _ = _extract(word, mask, joined,
                                                 start, NS, G)
    out, err = _resolve(words, counts, out_lens, ctx0, S)
    return out, err, counts, spec_fail


# ---------------------------------------------------------------------------
# Pass 3 — parallel LZ resolution over the batch
# ---------------------------------------------------------------------------

def propagate_match_fields(live, is_m, offs, dist, S: int):
    """Per-byte owning-symbol fields (o_ism, o_dist), each (B, S) i32.

    Fast path (S <= 128K): two packed monotone scatter-max + cummax
    propagations — 2 random passes over the byte grid instead of the
    owner-slot indirection's 4 (marks scatter + three take_along_axis
    gathers).  Chip-measured in tools/resolve_probe.py: the resolve
    prelude cost ~47 ms of 109 at T=1.08M, ~7.5 ms per random pass;
    this rewrite landed _resolve 109.4 -> 96.0 ms.  The packs are
    monotone in offs, so cummax tracks the latest symbol at or before
    each byte; offs <= S-1 < 2^17 and dist-1 < 2^15 fit one u32.

    Large-S fallback (anyinflate blocks up to 2^22): owner-slot +
    gathers, where the pack no longer fits 32 bits."""
    B, NS = offs.shape
    rows = jnp.arange(B)[:, None]
    if S <= 1 << 17:
        v1 = jax.lax.cummax(
            jnp.zeros((B, S + 1), jnp.int32).at[
                rows, jnp.where(live, offs, S)].max(
                jnp.where(live, (offs << 1) | is_m.astype(jnp.int32),
                          0), mode="drop")[:, :S], axis=1)
        v2 = jax.lax.cummax(
            jnp.zeros((B, S + 1), jnp.uint32).at[
                rows, jnp.where(is_m, offs, S)].max(
                jnp.where(is_m, (offs.astype(jnp.uint32) << 15)
                          | (dist - 1).astype(jnp.uint32), 0),
                mode="drop")[:, :S], axis=1)
        return v1 & 1, (v2 & 0x7FFF).astype(jnp.int32) + 1
    slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
    marks = jnp.zeros((B, S + 1), jnp.int32).at[
        rows, jnp.where(live, offs, S)].max(
        jnp.where(live, slots, 0), mode="drop")[:, :S]
    owner = jax.lax.cummax(marks, axis=1)
    o_ism = jnp.take_along_axis(is_m.astype(jnp.int32), owner, axis=1)
    o_dist = jnp.take_along_axis(dist, owner, axis=1)
    return o_ism, o_dist


def _resolve(words, counts, out_lens, ctx0, S: int):
    """words (B, NS) u32 compacted symbols; ctx0 (CTX,) u8 resolved
    context.  Returns (flat output (B*S,) u8 in global layout, err (B,)).

    Shards are consecutive member spans: shard b occupies
    [CTX + b*S, CTX + b*S + out_lens[b]) of the flat buffer (out_lens
    == S except the member tail), so in-batch back-references cross
    shard boundaries exactly like the original stream."""
    B, NS = words.shape
    slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
    live = slots < (counts[:, None] - 1)     # drop the trailing EOB
    kind = ((words >> 6) & 3).astype(jnp.int32)
    value = ((words >> 8) & 0xFF).astype(jnp.int32)
    dist = ((words >> 16) & 0x7FFF).astype(jnp.int32) + 1
    is_m = live & (kind == K_MATCH)
    is_l = live & (kind == K_LIT)
    err = jnp.sum(jnp.where(live & (kind == K_BAD), 1, 0), axis=1)
    # stream must end with EOB exactly at counts-1
    last = jnp.take_along_axis(
        words, jnp.maximum(counts - 1, 0)[:, None], axis=1)[:, 0]
    err = err + jnp.where(
        (counts < 1) | (((last >> 6) & 3) != K_EOB), 1, 0)

    olen = jnp.where(is_m, value + 3, jnp.where(is_l, 1, 0))
    ends = jnp.cumsum(olen, axis=1)
    offs = ends - olen
    err = err + jnp.where(ends[:, -1] != out_lens, 1, 0)

    base = CTX + jnp.arange(B, dtype=jnp.int32)[:, None] * S
    T = CTX + B * S
    # literal placement
    lit_pos = jnp.where(is_l, base + offs, T).reshape(-1)
    init = jnp.zeros(T + 1, jnp.int32).at[lit_pos].set(
        value.reshape(-1), mode="drop")
    init = init.at[:CTX].set(ctx0.astype(jnp.int32))

    # per output byte: owning-symbol fields.  The doubling loop only
    # needs o_ism and o_dist (P_run below covers EVERY match byte —
    # singleton runs give a == pos, reproducing the plain source).
    pos_in = jnp.arange(S, dtype=jnp.int32)[None, :]
    o_ism, o_dist = propagate_match_fields(live, is_m, offs, dist, S)
    glob = base + pos_in
    in_range = pos_in < out_lens[:, None]
    is_mb = (o_ism > 0) & in_range
    P = glob
    # out-of-window reference: a match's leftmost source byte is
    # base + offs - dist (k % dist == 0), so the former per-byte
    # P < 0 scan reduces to one per-symbol test
    err = err + jnp.sum(
        jnp.where(is_m & (base + offs - dist < 0), 1, 0), axis=1)
    # constant-distance run composition: consecutive match bytes with
    # the same distance d (RLE runs, periodic data — chains of depth
    # region/d) resolve analytically in ONE jump to below the region
    # start, instead of log2(depth) pointer-doubling rounds: for i in
    # a maximal const-d match run starting at a,
    #     out[i] == out[a - d + (i - a) % d].
    # Every intermediate hop i-d, i-2d, ... lies inside the run, so the
    # composition is exact; chains remaining for the doubling loop only
    # pass through distance CHANGES (shallow).
    prev_m = jnp.pad(is_mb, ((0, 0), (1, 0)))[:, :S]
    prev_d = jnp.pad(o_dist, ((0, 0), (1, 0)))[:, :S]
    boundary = is_mb & (~prev_m | (prev_d != o_dist))
    a = jax.lax.cummax(jnp.where(boundary, pos_in, 0), axis=1)
    # P_run >= base - CTX >= 0 always (dist <= MAX_DISTANCE == CTX)
    P_run = base + (a - o_dist) + (pos_in - a) % o_dist
    P = jnp.where(is_mb, P_run, P)
    P = jnp.clip(P, 0, T)

    Pf = jnp.concatenate([jnp.arange(CTX, dtype=jnp.int32),
                          P.reshape(-1),
                          jnp.asarray([T], jnp.int32)])

    # pointer doubling to fixpoint — real chains are shallow (match
    # ancestry depth), so converge adaptively instead of log2(T) rounds
    # (same treatment as anyinflate.resolve_compact)
    def dbl_cond(c):
        _, done, r = c
        return (~done) & (r < 40)

    def dbl_body(c):
        p, _, r = c
        p2 = jnp.take(p, p)
        return p2, jnp.all(p2 == p), r + 1

    Pf, _, _ = jax.lax.while_loop(
        dbl_cond, dbl_body, (Pf, jnp.asarray(False), jnp.int32(0)))
    out = jnp.take(init, Pf)[CTX:T]
    return out.astype(jnp.uint8), err


# ---------------------------------------------------------------------------
# Batched device decode
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("S", "NS", "interpret"))
def decode_batch(comp, clen, start, lims_ll, kbase_ll, syms_ll,
                 lims_d, kbase_d, syms_d, out_lens, ctx0, *,
                 S: int, NS: int, interpret: bool = False):
    word = _pass1(comp, lims_ll, kbase_ll, syms_ll,
                  lims_d, kbase_d, syms_d)
    words, counts = _walk(word, start, 8 * clen, NS, interpret)
    out, err = _resolve(words, counts, out_lens, ctx0, S)
    return out, err, counts


@jax.jit
def _pack_flags(err, spec):
    """One fetched array for the per-round flag pair — each blocking
    D2H is a 15-30 ms tunnel round-trip."""
    return jnp.stack([err.astype(jnp.int32), spec.astype(jnp.int32)])


def _bucket(c: int) -> int:
    b = 8192
    while b < c:
        b *= 2
    return b


import os  # noqa: E402

_WALK_MODE = os.environ.get("FLATE_TPU_INFLATE_WALK", "lanes")


def _host_decode_shard(sh: bytes, out_len: int, hist: bytes) -> bytes:
    """Exact host decode of one shard (non-final shards end in a sync
    flush, not BFINAL — read through the resumable stream with the
    indexed output budget, like pinflate)."""
    from .. import native
    try:
        st = native.InflateStream(sh, 0, hist or None)
        r = st.read(out_len)
        if len(r) == out_len:
            return r
    except RuntimeError:
        pass  # native unavailable: pure-Python block loop below
    bits = hinf._BitCursor(sh)
    outb = bytearray(hist)
    base = len(outb)
    while len(outb) - base < out_len:
        bits.read(1)                       # bfinal (budget-bounded)
        btype = bits.read(2)
        if btype == 0:
            hinf._decode_stored(bits, outb)
        elif btype == 1:
            ll, dd = hinf.fixed_tables()
            hinf._decode_coded_block(bits, outb, ll, dd)
        elif btype == 2:
            ll, dd = hinf._decode_dynamic_header(bits)
            hinf._decode_coded_block(bits, outb, ll, dd)
        else:
            raise InvalidBlockType()
    return bytes(outb[base:base + out_len])


class _Segmented(Exception):
    """Internal: the member has segmented (multi-block) shards — the
    shard-parallel fast path cannot decode it; re-route to the chained
    device path with exact index entries."""


def decompress_member_device(data: bytes, offset: int,
                             container: Container = Container.GZIP,
                             batch: int = 8, interpret: bool = False,
                             verify: bool = True):
    """Decode one indexed member starting at `offset`.

    Returns (bytes, next_offset).  Raises LookupError when the member
    carries no usable FLT1 index (caller falls back to the host path).
    Members with segmented shards (intra-shard stored/coded block mix)
    re-decode through jx.anyinflate's chained device path, with the
    index's shard offsets as exact chain entries."""
    try:
        return _decompress_member_indexed(data, offset, container,
                                          batch, interpret, verify)
    except _Segmented:
        from . import anyinflate
        hdr_len, meta = parse_header(container, data[offset:])
        comp_lens, _out_lens, _flags = parse_index_extra(meta.extra)
        starts = np.concatenate([[0], np.cumsum(comp_lens)[:-1]])
        entries = [8 * int(s) for s in starts]
        return anyinflate._decompress_member_any(
            data, offset, container, anyinflate.CHUNK_BYTES,
            interpret, verify, entries=entries)


def pack_coded_run(plans_run, hist: bytes):
    """Pack a member-consecutive run of coded shard plans into the
    decode_batch(2) argument tuple: padded comp grid, per-row meta,
    Moffat–Turpin threshold scalars, and the shared 32 KiB context.
    Used by the indexed decode loop and the bench's device-time probe."""
    cmax = _bucket(max(len(sh) for _, sh in plans_run))
    Bc = len(plans_run)
    comp_a = np.zeros((Bc, cmax), np.uint8)
    meta = np.zeros((Bc, 3), np.int32)
    sc = {k2: np.zeros((Bc, 16), np.uint32) for k2 in ("lll", "lld")}
    kb = {k2: np.zeros((Bc, 16), np.int32) for k2 in ("lll", "lld")}
    sy_ll = np.zeros((Bc, 288), np.int32)
    sy_d = np.zeros((Bc, 32), np.int32)
    for bi, (p2, sh2) in enumerate(plans_run):
        comp_a[bi, :len(sh2)] = np.frombuffer(sh2, np.uint8)
        meta[bi] = (len(sh2), p2.start_bit, p2.out_len)
        sc["lll"][bi], kb["lll"][bi], sy_ll[bi] = p2.ll
        sc["lld"][bi], kb["lld"][bi], sy_d[bi] = p2.d
    ctx0 = np.zeros(CTX, np.uint8)
    if hist:
        ctx0[CTX - len(hist):] = np.frombuffer(hist, np.uint8)
    return (jnp.asarray(comp_a), jnp.asarray(meta[:, 0]),
            jnp.asarray(meta[:, 1]),
            jnp.asarray(sc["lll"]), jnp.asarray(kb["lll"]),
            jnp.asarray(sy_ll),
            jnp.asarray(sc["lld"]), jnp.asarray(kb["lld"]),
            jnp.asarray(sy_d),
            jnp.asarray(meta[:, 2]), jnp.asarray(ctx0))


def _decompress_member_indexed(data: bytes, offset: int,
                               container: Container,
                               batch: int, interpret: bool,
                               verify: bool):
    hdr_len, meta = parse_header(container, data[offset:])
    if meta is None or meta.extra is None:
        raise LookupError("no FLT1 index")
    idx = parse_index_extra(meta.extra)
    if idx is None:
        raise LookupError("no FLT1 index")
    comp_lens, out_lens, _flags = idx
    body = offset + hdr_len
    starts = body + np.concatenate([[0], np.cumsum(comp_lens)[:-1]])
    total_comp = int(comp_lens.sum())

    S = int(out_lens.max()) if len(out_lens) else 1
    S = max(-(-S // 1024) * 1024, 1024)
    if S > 1 << 17:
        # our encoder writes <=128K shards; a larger (foreign/hostile)
        # index exceeds the packed-field bound in _resolve — host path
        raise LookupError("FLT1 shards too large for device decode")
    NS = S + 128
    n = len(comp_lens)
    out = bytearray()
    hasher = Hasher(container)

    i = 0
    while i < n:
        nb = min(batch, n - i)
        plans = []
        for j in range(i, i + nb):
            sh = data[starts[j]:starts[j] + int(comp_lens[j])]
            plans.append((plan_shard(sh, int(out_lens[j])), sh))
        # process shards strictly in member order: stored shards flush
        # to `out` on host (pure memcpy); consecutive runs of coded
        # shards dispatch together with ctx0 taken from the already-
        # flushed history, so back-references across a preceding stored
        # shard resolve against real bytes (batch rows must be
        # member-consecutive for in-batch back-references)
        j = 0
        while j < nb:
            p, sh = plans[j]
            if p.kind == "stored":
                buf = bytearray()
                for off, ln in p.stored_spans:
                    buf += sh[off:off + ln]
                r = bytes(buf[:p.out_len])
                out += r
                hasher.update(r)
                j += 1
                continue
            if p.kind == "mixed":
                # segmented shard (stored+coded blocks): the member
                # re-decodes on device through the chained path with
                # exact index entries
                raise _Segmented()
            k = j
            while k < nb and plans[k][0].kind == "coded":
                k += 1
            run = list(range(j, k))
            args = pack_coded_run([plans[jj] for jj in run],
                                  bytes(out[-CTX:]))
            if _WALK_MODE == "serial":
                dev_out, err, _ = decode_batch(
                    *args, S=S, NS=NS, interpret=interpret)
                spec_np = np.zeros(len(run), bool)
                err_np = np.asarray(err)
            else:
                dev_out, err, _, spec_fail = decode_batch2(
                    *args, S=S, NS=NS, interpret=interpret)
                try:  # one blocking round-trip for the two flag arrays
                    dev_out.copy_to_host_async()
                except AttributeError:
                    pass
                flags = np.asarray(_pack_flags(err, spec_fail))
                err_np, spec_np = flags[0].astype(bool), \
                    flags[1].astype(bool)
            if spec_np.any():
                # lane speculation unproven for some shard: decode the
                # run on host (exact, rare) — correctness never depends
                # on the speculative path
                for bi, jj in enumerate(run):
                    p2, sh2 = plans[jj]
                    r = _host_decode_shard(sh2, p2.out_len,
                                           bytes(out[-CTX:]))
                    out += r
                    hasher.update(r)
                j = k
                continue
            out_np = np.asarray(dev_out).reshape(len(run), S)
            if err_np.any():
                # a coded-first shard with MORE blocks after its first
                # EOB (segmented) decodes short and poisons in-batch
                # back-references; re-decode the member on the chained
                # device path — genuinely corrupt streams raise the
                # exact taxonomy from there
                raise _Segmented()
            for bi, jj in enumerate(run):
                r = out_np[bi, :plans[jj][0].out_len].tobytes()
                out += r
                hasher.update(r)
            j = k
        i += nb

    foot_off = body + total_comp
    foot_len = parse_footer(container, data[foot_off:], hasher)
    return bytes(out), foot_off + foot_len


def decompress_device(data: bytes,
                      container: Container = Container.GZIP,
                      batch: int = 8,
                      interpret: bool = False) -> bytes:
    """Device decode of a (possibly multi-member) indexed stream."""
    from .. import metrics
    with metrics.timed("device.decompress_indexed", len(data)) as _m:
        out = bytearray()
        offset = 0
        while offset < len(data):
            chunk, offset = decompress_member_device(
                data, offset, container, batch=batch, interpret=interpret)
            out += chunk
            if container is not Container.GZIP:
                break
        _m["bytes_out"] = len(out)
    return bytes(out)
