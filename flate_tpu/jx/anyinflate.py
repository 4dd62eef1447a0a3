"""Device inflate of ARBITRARY deflate streams — no FLT1 index needed.

The reference decodes anyone's stream serially (inflate.zig:220-239);
the round-2 device path could only decode self-produced FLT1-indexed
members.  This module closes that gap with the rapidgzip recipe
(SURVEY §7 step 5) re-derived for TPU:

1. **Chunk entry discovery** (host C, flate_tpu.native.scan_headers):
   the compressed body is cut into chunks; for each chunk the scanner
   finds the first *validated* dynamic-block header (cheap-filter
   cascade + full header parse).  Every such header is a legal decode
   entry point.  Chunk 0 always enters at bit 0 (exact).
2. **Speculative chained block decode** (device): each round decodes
   one block per active chain position — pass1 speculative symbol
   decode over the block's span, multi-lane walk with join resolve
   (jx.inflate2), symbol compaction with EOB discovery.  The EOB gives
   the exact bit position of the NEXT block header, which the host
   parses (tiny) and queues for the next round, so all chunks advance
   their chains concurrently.  Chains are confirmed where they meet
   the next chunk's entry; mismatching speculative work is discarded
   (never emitted).
3. **LZ resolution in stream order** (device): confirmed blocks are
   re-batched consecutively and resolved with a COMPACT output layout
   (rows at cumulative offsets, so cross-block back-references inside
   a batch land on real bytes) and a 32 KiB context carry between
   batches.  Stored blocks are raw byte spans flushed from the host.

Correctness never depends on speculation: join failures re-decode the
block with the exact serial walk; spans too short to contain the EOB
escalate; anything still unresolved falls back to the host decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts, tables
from ..containers import Container, Hasher, parse_footer, parse_header
from ..errors import (
    EndOfStream,
    InvalidBlockType,
    InvalidCode,
    WrongStoredBlockNlen,
)
from .. import inflate as hinf
from . import inflate2 as i2

CTX = consts.MAX_DISTANCE

CHUNK_BYTES = 1 << 19            # speculative chain spacing (512 KiB)
SPAN0 = 1 << 16                  # initial block span (64 KiB comp)
MAX_SPAN = 1 << 21               # escalation cap (2 MiB comp)
RES_B = 8                        # resolve batch rows
MAX_S = 1 << 22                  # per-block output cap before host fallback


# ---------------------------------------------------------------------------
# Host-side block planning at an exact bit position
# ---------------------------------------------------------------------------

class BlockPlan:
    __slots__ = ("kind", "pos", "bfinal", "body_bit", "ll", "d",
                 "stored_off", "stored_len", "end_bit")


def plan_block_at(body: bytes, pos: int) -> BlockPlan:
    """Parse ONE block header at exact bit `pos` (host, tiny).

    stored blocks are fully resolved here (end_bit known); coded blocks
    get canonical decode scalars and decode on device."""
    p = BlockPlan()
    p.pos = pos
    bits = hinf._BitCursor(body, pos)
    p.bfinal = bits.read(1)
    btype = bits.read(2)
    if btype == 0:
        bits.align_to_byte()
        ln = bits.read(16)
        nlen = bits.read(16)
        if (ln ^ nlen) & 0xFFFF != 0xFFFF:
            raise WrongStoredBlockNlen("stored LEN/NLEN mismatch")
        p.kind = "stored"
        p.stored_off = bits.pos >> 3
        p.stored_len = ln
        if p.stored_off + ln > len(body):
            raise EndOfStream("stored block past end")
        p.end_bit = (p.stored_off + ln) * 8
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
    p.kind = "coded"
    p.body_bit = bits.pos
    p.ll = i2.canonical_scalars(ll_lens, 288)
    p.d = i2.canonical_scalars(d_lens, 32)
    return p


# ---------------------------------------------------------------------------
# Device stages
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("NS", "G", "serial",
                                             "interpret"))
def symbol_batch(comp, clen, start, lims_ll, kbase_ll, syms_ll,
                 lims_d, kbase_d, syms_d, *, NS: int,
                 G: int = i2.LANE_G, serial: bool = False,
                 interpret: bool = False):
    """Span bytes -> compacted true symbols (stay on device).

    Returns (words (B, NS), counts, spec_fail, has_eob, out_len,
    end_bit).  serial=True uses the exact one-symbol-per-step walk
    (retry path for join failures)."""
    word = i2._pass1(comp, lims_ll, kbase_ll, syms_ll,
                     lims_d, kbase_d, syms_d)
    if serial:
        # exact walk; reuse extraction by building the mask from the
        # walked words' positions is awkward — the serial walk already
        # emits compacted words+counts, so recompute the extras here
        words, counts = i2._walk(word, start, 8 * clen, NS, interpret)
        slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
        kind = ((words >> 6) & 3).astype(jnp.int32)
        live = slots < (counts[:, None] - 1)
        value = ((words >> 8) & 0xFF).astype(jnp.int32)
        olen = jnp.where(live & (kind == i2.K_MATCH), value + 3,
                         jnp.where(live & (kind == i2.K_LIT), 1, 0))
        out_len = jnp.sum(olen, axis=1)
        last = jnp.take_along_axis(
            words, jnp.maximum(counts - 1, 0)[:, None], axis=1)[:, 0]
        has_eob = (counts >= 1) & (((last >> 6) & 3) == i2.K_EOB)
        # end bit: the serial walk stops AT the EOB; recover its
        # position by replaying advances — sum of adv of live symbols
        adv = jnp.where(slots < counts[:, None],
                        (words & 63).astype(jnp.int32), 0)
        end_bit = start.astype(jnp.int32) + jnp.sum(adv, axis=1)
        spec_fail = ~has_eob
        return words, counts, spec_fail, has_eob, out_len, end_bit
    mask, joined = i2._lane_walk(word, start, 8 * clen, G=G,
                                 interpret=interpret)
    return i2._extract(word, mask, joined, start, NS, G)


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def resolve_compact(words, counts, out_lens, ctx0, *, S: int,
                    interpret: bool = False):
    """Parallel LZ resolution with COMPACT row placement.

    words (B, NS) compacted symbols of CONSECUTIVE blocks; row b's
    output occupies [CTX + prefix(out_lens)[b], ... + out_lens[b]) of a
    flat buffer, so back-references cross rows exactly like the
    original stream (variable-size blocks — unlike jx.inflate2._resolve
    whose rows sit at a fixed stride).  Returns (flat (B*S,) u8 whose
    first sum(out_lens) bytes are the stream, err (B,))."""
    B, NS = words.shape
    slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
    live = slots < (counts[:, None] - 1)
    kind = ((words >> 6) & 3).astype(jnp.int32)
    value = ((words >> 8) & 0xFF).astype(jnp.int32)
    dist = ((words >> 16) & 0x7FFF).astype(jnp.int32) + 1
    is_m = live & (kind == i2.K_MATCH)
    is_l = live & (kind == i2.K_LIT)
    err = jnp.sum(jnp.where(live & (kind == i2.K_BAD), 1, 0), axis=1)
    last = jnp.take_along_axis(
        words, jnp.maximum(counts - 1, 0)[:, None], axis=1)[:, 0]
    err = err + jnp.where(
        (counts < 1) | (((last >> 6) & 3) != i2.K_EOB), 1, 0)

    olen = jnp.where(is_m, value + 3, jnp.where(is_l, 1, 0))
    ends = jnp.cumsum(olen, axis=1)
    offs = ends - olen
    err = err + jnp.where(ends[:, -1] != out_lens, 1, 0)

    base = CTX + (jnp.cumsum(out_lens) - out_lens)[:, None]  # (B, 1)
    T = CTX + B * S
    total = jnp.sum(out_lens)
    # literal placement (buffer positions are already compact)
    lit_pos = jnp.where(is_l, base + offs, T).reshape(-1)
    init = jnp.zeros(T + 1, jnp.int32).at[lit_pos].set(
        value.reshape(-1), mode="drop")
    init = init.at[:CTX].set(ctx0.astype(jnp.int32))

    # per output byte: owning-symbol fields (packed scatter-max
    # propagation when S fits the 32-bit pack — see
    # inflate2.propagate_match_fields)
    pos_in = jnp.arange(S, dtype=jnp.int32)[None, :]
    o_ism, o_dist = i2.propagate_match_fields(live, is_m, offs, dist, S)
    in_range = pos_in < out_lens[:, None]
    glob = base + pos_in
    is_mb = (o_ism > 0) & in_range
    # a match's leftmost source byte is base + offs - dist
    err = err + jnp.sum(
        jnp.where(is_m & (base + offs - dist < 0), 1, 0), axis=1)
    # constant-distance run composition (same derivation as
    # inflate2._resolve: every intermediate hop of a const-d run byte
    # lies inside the run, so one analytic jump lands below its start;
    # singleton runs reproduce the plain source pos - dist)
    prev_m = jnp.pad(is_mb, ((0, 0), (1, 0)))[:, :S]
    prev_d = jnp.pad(o_dist, ((0, 0), (1, 0)))[:, :S]
    boundary = is_mb & (~prev_m | (prev_d != o_dist))
    a = jax.lax.cummax(jnp.where(boundary, pos_in, 0), axis=1)
    P_run = base + (a - o_dist) + (pos_in - a) % o_dist
    P = jnp.where(is_mb, P_run, glob)
    P = jnp.clip(P, 0, T)

    # compact (row, pos_in) -> buffer order: keys are the buffer
    # positions themselves (globally unique and dense), carried sort
    key = jnp.where(in_range, glob, T).reshape(-1).astype(jnp.uint32)
    _, P_sorted = jax.lax.sort([key, P.reshape(-1).astype(jnp.uint32)],
                               dimension=0, num_keys=1)
    idx = jnp.arange(B * S, dtype=jnp.int32)
    Pf_body = jnp.where(idx < total, P_sorted.astype(jnp.int32),
                        CTX + idx)
    Pf = jnp.concatenate([jnp.arange(CTX, dtype=jnp.int32), Pf_body,
                          jnp.asarray([T], jnp.int32)])

    # pointer doubling to fixpoint — real chains are shallow (match
    # ancestry depth), so converge adaptively instead of log2(T) rounds
    def dbl_cond(c):
        _, done, r = c
        return (~done) & (r < 40)

    def dbl_body(c):
        Pf, _, r = c
        Pf2 = jnp.take(Pf, Pf)
        return Pf2, jnp.all(Pf2 == Pf), r + 1

    Pf, _, _ = jax.lax.while_loop(
        dbl_cond, dbl_body, (Pf, jnp.asarray(False), jnp.int32(0)))
    out = jnp.take(init, Pf)[CTX:T]
    return out.astype(jnp.uint8), err


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

@jax.jit
def _pack_meta(counts, fail, has_eob, out_len, end_bit):
    # end_bit is span-relative (<= 2 MiB * 8 bits), so i32 is safe
    return jnp.stack([
        counts.astype(jnp.int32), fail.astype(jnp.int32),
        has_eob.astype(jnp.int32), out_len.astype(jnp.int32),
        end_bit.astype(jnp.int32)])


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class _Block:
    __slots__ = ("plan", "words", "counts_i", "out_len", "end_bit",
                 "row")

    def __init__(self, plan):
        self.plan = plan
        self.words = None        # device (B, NS) array holding this row
        self.row = 0
        self.out_len = 0
        self.end_bit = 0


def _decode_round(body: bytes, plans: list, span: dict,
                  serial_set: set, interpret: bool) -> dict:
    """Decode one block per plan on device; returns pos -> result dict
    with (words ref, row, counts, out_len, end_bit, ok)."""
    groups: dict = {}
    for p in plans:
        byte0 = p.pos >> 3
        cap = span.get(p.pos, SPAN0)
        C = _bucket(min(len(body) - byte0, cap), 8192)
        key = (C, p.pos in serial_set)
        groups.setdefault(key, []).append((p, byte0))
    results = {}
    for (C, serial), grp in groups.items():
        Bc = _bucket(len(grp), 1)    # pad rows: bound compile variants
        NS = min(2 * C, 1 << 20)
        comp = np.zeros((Bc, C), np.uint8)
        clen = np.zeros(Bc, np.int32)
        start = np.zeros(Bc, np.int32)
        sc_ll = np.zeros((Bc, 16), np.uint32)
        kb_ll = np.zeros((Bc, 16), np.int32)
        sy_ll = np.zeros((Bc, 288), np.int32)
        sc_d = np.zeros((Bc, 16), np.uint32)
        kb_d = np.zeros((Bc, 16), np.int32)
        sy_d = np.zeros((Bc, 32), np.int32)
        for bi, (p, byte0) in enumerate(grp):
            sl = body[byte0:byte0 + C]
            comp[bi, :len(sl)] = np.frombuffer(sl, np.uint8)
            clen[bi] = len(sl)
            start[bi] = p.body_bit - 8 * byte0
            sc_ll[bi], kb_ll[bi], sy_ll[bi] = p.ll
            sc_d[bi], kb_d[bi], sy_d[bi] = p.d
        words, counts, fail, has_eob, out_len, end_bit = symbol_batch(
            jnp.asarray(comp), jnp.asarray(clen), jnp.asarray(start),
            jnp.asarray(sc_ll), jnp.asarray(kb_ll), jnp.asarray(sy_ll),
            jnp.asarray(sc_d), jnp.asarray(kb_d), jnp.asarray(sy_d),
            NS=NS, serial=serial, interpret=interpret)
        # one packed fetch: each blocking D2H costs a 15-30 ms tunnel
        # round-trip, so the five per-group scalars ride one array
        meta_np = np.asarray(_pack_meta(counts, fail, has_eob,
                                        out_len, end_bit))
        cn_np, fail_np, eob_np, ol_np, eb_np = meta_np
        for bi, (p, byte0) in enumerate(grp):
            results[p.pos] = {
                "words": words, "row": bi, "plan": p,
                "counts": int(cn_np[bi]),
                "out_len": int(ol_np[bi]),
                "end_bit": 8 * byte0 + int(eb_np[bi]),
                "has_eob": bool(eob_np[bi]),
                "ok": not bool(fail_np[bi]),
                "serial": serial,
                "span": C,
            }
    return results


def decompress_device_any(data: bytes,
                          container: Container = Container.GZIP,
                          chunk_bytes: int = CHUNK_BYTES,
                          interpret: bool = False,
                          verify: bool = True) -> bytes:
    """Device decode of an arbitrary (unindexed) single/multi-member
    stream.  Reference behavior: inflate.zig:220-280 (any conformant
    stream); parallel design per module docstring."""
    from .. import metrics
    with metrics.timed("device.decompress_any", len(data)) as _m:
        out = bytearray()
        offset = 0
        while offset < len(data):
            chunk, offset = _decompress_member_any(
                data, offset, container, chunk_bytes, interpret, verify)
            out += chunk
            if container is not Container.GZIP:
                break
        _m["bytes_out"] = len(out)
    return bytes(out)


def _decompress_member_any(data: bytes, offset: int,
                           container: Container, chunk_bytes: int,
                           interpret: bool, verify: bool,
                           entries: list | None = None):
    """`entries` overrides chunk-entry discovery with KNOWN block-header
    bit positions (relative to the member body) — e.g. the per-shard
    offsets of an FLT1 index, which make every chain exact."""
    hdr_len, _meta = parse_header(container, data[offset:])
    body = data[offset + hdr_len:]
    nbits = 8 * len(body)

    # ---- chunk entries (speculative chain heads) ----------------------
    if entries is None:
        from .. import native
        entries = [0]
        nchunks = max(1, -(-len(body) // chunk_bytes))
        for k in range(1, nchunks):
            found = native.scan_headers(
                body, 8 * k * chunk_bytes, 8 * (k + 1) * chunk_bytes,
                max_out=1) if native.inflate_available() else []
            if found:
                entries.append(int(found[0]))
    else:
        entries = sorted({0, *(int(e) for e in entries if e < nbits)})

    # ---- chained speculative decode rounds ----------------------------
    decoded: dict = {}           # header bit pos -> result/stored plan
    frontier = set(entries)
    span: dict = {}
    serial_set: set = set()
    final_pos = None             # header pos of the BFINAL block
    chain_head = 0
    stall = 0
    while True:
        todo = sorted(frontier - set(decoded))
        if not todo:
            break
        plans = []
        for pos in todo:
            frontier.discard(pos)
            if pos >= nbits:
                continue
            try:
                p = plan_block_at(body, pos)
            except Exception:
                if pos in entries and pos != 0:
                    continue     # bad speculative entry: chain 0 catches up
                raise
            if p.kind == "stored":
                decoded[pos] = {"plan": p, "end_bit": p.end_bit,
                                "ok": True, "stored": True}
                if not p.bfinal:
                    frontier.add(p.end_bit)
                elif final_pos is None:
                    final_pos = pos
            else:
                plans.append(p)
        if plans:
            res = _decode_round(body, plans, span, serial_set, interpret)
            for pos, r in res.items():
                if not r["has_eob"] and r["span"] < MAX_SPAN \
                        and (pos >> 3) + r["span"] < len(body):
                    # EOB not in span: escalate the span and retry
                    span[pos] = r["span"] * 2
                    frontier.add(pos)
                    continue
                if not r["ok"] and not r["serial"]:
                    # join failure: retry with the exact serial walk
                    serial_set.add(pos)
                    frontier.add(pos)
                    continue
                if not r["ok"]:
                    raise InvalidCode(f"block at bit {pos} undecodable")
                r["stored"] = False
                decoded[pos] = r
                if not r["plan"].bfinal:
                    frontier.add(r["end_bit"])
                elif final_pos is None:
                    final_pos = pos
        # chain-complete check: walk from 0 through decoded.  The chain
        # head's block is always in the frontier, so every round either
        # finishes it or retries it (span escalation / serial rewalk,
        # both bounded) — a persistent stall is a logic error, not data.
        pos = chain_head
        while pos in decoded and not decoded[pos]["plan"].bfinal:
            pos = decoded[pos]["end_bit"]
        if pos in decoded and decoded[pos]["plan"].bfinal:
            break
        stall = stall + 1 if pos == chain_head else 0
        chain_head = pos
        frontier.add(pos)
        if stall > 12:
            raise InvalidCode("block chain did not converge")

    # ---- confirmed chain in stream order ------------------------------
    chain = []
    pos = 0
    while True:
        if pos not in decoded:
            raise InvalidCode(f"chain break at bit {pos}")
        r = decoded[pos]
        chain.append(r)
        if r["plan"].bfinal:
            end_bit = r["end_bit"]
            break
        pos = r["end_bit"]

    # ---- resolve in stream order with context carry -------------------
    out = bytearray()
    hasher = Hasher(container)

    def flush(batch):
        rows = [r for r in batch]
        S = _bucket(max(max(r["out_len"] for r in rows), 1024), 1024)
        if S > MAX_S:
            raise InvalidCode("block output exceeds device cap")
        NSr = max(r["words"].shape[1] for r in rows)
        w = jnp.stack([
            jnp.pad(r["words"][r["row"]],
                    (0, NSr - r["words"].shape[1]))
            for r in rows])
        counts = jnp.asarray([r["counts"] for r in rows], jnp.int32)
        out_lens = jnp.asarray([r["out_len"] for r in rows], jnp.int32)
        ctx0 = np.zeros(CTX, np.uint8)
        hist = bytes(out[-CTX:])
        if hist:
            ctx0[CTX - len(hist):] = np.frombuffer(hist, np.uint8)
        flat, err = resolve_compact(w, counts, out_lens,
                                    jnp.asarray(ctx0), S=S,
                                    interpret=interpret)
        if np.asarray(err).any():
            raise InvalidCode("device resolve failed")
        total = int(np.asarray(out_lens).sum())
        r = np.asarray(flat)[:total].tobytes()
        out.extend(r)
        hasher.update(r)

    batch: list = []
    for r in chain:
        if r.get("stored"):
            if batch:
                flush(batch)
                batch = []
            p = r["plan"]
            s = body[p.stored_off:p.stored_off + p.stored_len]
            out.extend(s)
            hasher.update(s)
        else:
            batch.append(r)
            if len(batch) >= RES_B:
                flush(batch)
                batch = []
    if batch:
        flush(batch)

    foot_off = offset + hdr_len + ((end_bit + 7) // 8)
    if verify:
        foot_len = parse_footer(container, data[foot_off:], hasher)
    else:
        foot_len = container.footer_size
    return bytes(out), foot_off + foot_len
