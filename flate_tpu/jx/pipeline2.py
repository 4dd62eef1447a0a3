"""Fully device-resident compression pipeline (v2).

One jitted program per shard batch does everything round 1 split across
two device phases and a host planning loop:

    windows -> fused matcher -> lazy parse -> device Huffman planning
    -> device header build -> block-type selection -> Pallas bit-pack

The host only moves bytes: enqueue the next batch, fetch (words,
total_bits) of finished batches, slice + concatenate the byte-aligned
shard streams, and wrap the container.  There is no host planning
round-trip and no host-spec fallback — tail shards are zero-padded and
bounded by valid_len on device.

Reference call stack being replaced: SURVEY §3.1 (deflate.compress);
round-1 twin: jx/pipeline.compress_device.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from ..checksums import adler32_combine, crc32_combine
from ..containers import (Container, GzipMetadata, Hasher, write_footer,
                          write_header)
from . import checksum, encode2, match2
from . import parse as prs
from . import pack as pk
from . import squeeze as sq

CTX = consts.MAX_DISTANCE

# kernel-path level knobs: (K candidates, carried words, lazy, max_lazy,
# K3 3-byte cands, squeeze, parse-block size).  The cost DP (squeeze)
# is near-free after the static-column restructure and runs at levels
# 2 and 4-9; with it the device path beats zlib's compressed size at
# EVERY level (chip-measured ladder: 0.93-0.99x).  7-9 add deeper
# word carries and 4 KiB parse blocks for the last ~1%.
LEVEL_KERNEL = {
    1: (4, 2, False, 0, 0, False, 1024),
    2: (8, 2, False, 0, 0, True, 1024),
    3: (12, 4, False, 0, 0, False, 1024),
    4: (16, 4, True, 4, 0, True, 1024),
    5: (24, 8, True, 16, 0, True, 1024),
    6: (48, 8, True, 32, 0, True, 1024),
    7: (64, 16, True, 64, 8, True, 4096),
    8: (96, 16, True, 128, 12, True, 4096),
    9: (160, 16, True, 258, 16, True, 4096),
}


def _nwr(S: int, seg: int) -> int:
    # ceiling: the kind argmin never exceeds the exact all-stored cost
    # (44 bits per merged stored header incl. pad), + trailer block
    nseg = -(-S // seg)
    worst_bits = 8 * S + 44 * (nseg + 2) + 256
    return -(-worst_bits // (32 * 128)) + pk.WIN // 128


def encode_core(windows: jnp.ndarray, ctx_lens: jnp.ndarray,
                valid_lens: jnp.ndarray, finals: jnp.ndarray, *, S: int,
                ctx: int, K: int, nw: int, lazy: bool, max_lazy: int,
                K3: int = 0, squeeze: bool = False,
                blk: int = prs.PARSE_BLK, interpret: bool = False):
    """(B, ctx+S) primed windows -> (words, tbits, kind).

    The traceable heart of the v2 pipeline, shared by the single-device
    jit wrapper and the shard_map mesh path (which primes windows with a
    ppermute context exchange instead of a batch roll)."""
    mlen, mdist = match2.find_matches_fused(
        windows, ctx_lens, valid_lens, K=K, nw=nw, ctx=ctx, K3=K3,
        interpret=interpret)
    mlen, mdist = prs.truncate_matches(mlen, mdist, ctx, blk)
    take, _ = prs.decide(mlen, mdist, lazy, max_lazy)
    starts = prs.parse_blocks(mlen, mdist, start=ctx, lazy=lazy,
                              max_lazy=max_lazy, blk=blk)
    m_r, d_r = mlen[:, ctx:], mdist[:, ctx:]
    take_r, starts_r = take[:, ctx:], starts[:, ctx:]
    if squeeze:
        ll_bits, d_bits = sq.greedy_code_lengths(
            windows[:, ctx:], m_r, d_r, starts_r, take_r, valid_lens)
        take_r, starts_r, sel = sq.squeeze_parse(
            windows[:, ctx:], m_r, d_r, ll_bits, d_bits, blk=blk)
        m_r = jnp.where(take_r, sel, 0)
    seg = encode2.seg_size(S, blk)
    vals, bits, total_bits, kind = encode2.build_fields(
        windows[:, ctx:], m_r, d_r, starts_r,
        take_r, valid_lens, finals, S, seg)
    words, tbits = pk.pack_fields(vals, bits, _nwr(S, seg),
                                  interpret=interpret)
    return words, tbits, kind


@functools.partial(jax.jit,
                   static_argnames=("S", "ctx", "K", "nw", "lazy",
                                    "max_lazy", "K3", "squeeze", "blk",
                                    "interpret"))
def encode_batch(shards: jnp.ndarray, ctx0: jnp.ndarray,
                 ctx_lens: jnp.ndarray, valid_lens: jnp.ndarray,
                 finals: jnp.ndarray, *, S: int, ctx: int, K: int, nw: int,
                 lazy: bool, max_lazy: int, K3: int = 0,
                 squeeze: bool = False, blk: int = prs.PARSE_BLK,
                 interpret: bool = False):
    """shards (B, S) u8 -> (words (B, nwr, 128) u32, tbits (B,), kind)."""
    # context priming: row b takes the previous rows' tails on device;
    # row 0 (and rows < ceil(ctx/S)) take the host/device carry
    windows = _prime_windows(shards, ctx0, ctx=ctx)
    return encode_core(windows, ctx_lens, valid_lens, finals, S=S, ctx=ctx,
                       K=K, nw=nw, lazy=lazy, max_lazy=max_lazy, K3=K3,
                       squeeze=squeeze, blk=blk, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("ctx",))
def _prime_windows(shards: jnp.ndarray, ctx0: jnp.ndarray, *, ctx: int):
    """(B, S) + (ctx,) carry -> (B, ctx+S) windows.

    Row b's context is the last `ctx` bytes of [carry | rows 0..b-1],
    so ctx may exceed S (kc = ceil(ctx/S) previous rows contribute —
    small-shard configs keep the full 32 KiB DEFLATE window)."""
    B, S = shards.shape
    kc = -(-ctx // S)
    pad = kc * S - ctx
    c0 = jnp.pad(ctx0, (pad, 0)) if pad else ctx0
    ext = jnp.concatenate([c0.reshape(kc, S), shards], axis=0)
    parts = [ext[j:j + B] for j in range(kc)] + [shards]
    return jnp.concatenate(parts, axis=1)[:, pad:]


@functools.partial(jax.jit, static_argnames=("lazy", "max_lazy", "ctx",
                                             "blk", "interpret"))
def _parse_stage(mlen: jnp.ndarray, mdist: jnp.ndarray, *, lazy: bool,
                 max_lazy: int, ctx: int, blk: int = prs.PARSE_BLK,
                 interpret: bool = False):
    """Truncate matches to parse blocks, decide, walk.  Returns the
    truncated (mlen, mdist) — the field build must use them so emitted
    tokens agree with the walk."""
    mlen, mdist = prs.truncate_matches(mlen, mdist, ctx, blk)
    take, _ = prs.decide(mlen, mdist, lazy, max_lazy)
    starts = prs.parse_blocks(mlen, mdist, start=ctx, lazy=lazy,
                              max_lazy=max_lazy, blk=blk)
    return take, starts, mlen, mdist


# grid_only squeeze: every DP option reads a dynamic-scalar ring column
# instead of a per-lane one-hot over the (L, WIN) ring (squeeze.py:96-
# 101); matches quantize DOWN to the nearest grid length.  Chip A/B
# knob (r4 profile: squeeze 24.9 ms of 101.8).
SQUEEZE_GRID_ONLY = os.environ.get("FLATE_TPU_SQUEEZE_GRID") == "1"


@functools.partial(jax.jit, static_argnames=("blk", "grid_only"))
def _squeeze_stage(window_tail, m_r, d_r, take_r, starts_r, valid_lens,
                   blk: int = prs.PARSE_BLK,
                   grid_only: bool = SQUEEZE_GRID_ONLY):
    ll_bits, d_bits = sq.greedy_code_lengths(
        window_tail, m_r, d_r, starts_r, take_r, valid_lens)
    take2, starts2, sel = sq.squeeze_parse(
        window_tail, m_r, d_r, ll_bits, d_bits, blk=blk,
        grid_only=grid_only)
    return take2, starts2, jnp.where(take2, sel, 0)


def encode_batch_staged(shards, ctx0, ctx_lens, valid_lens, finals, *,
                        S: int, ctx: int, K: int, nw: int, lazy: bool,
                        max_lazy: int, K3: int = 0, squeeze: bool = False,
                        blk: int = prs.PARSE_BLK, interpret: bool = False):
    """Stage-jitted twin of encode_batch.

    Same math as the single-jit path, but each stage is its own jitted
    program: compile time at production shapes drops from tens of
    minutes (the fused program) to a couple of minutes total, at the
    cost of inter-stage HBM round-trips (microseconds — every stage is
    memory-bound on (B, W) arrays anyway).  Intermediates stay on
    device; the host never blocks between stages."""
    windows = _prime_windows(shards, ctx0, ctx=ctx)
    mlen, mdist = match2.find_matches_fused(
        windows, ctx_lens, valid_lens, K=K, nw=nw, ctx=ctx, K3=K3,
        interpret=interpret)
    take, starts, mlen, mdist = _parse_stage(
        mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx, blk=blk,
        interpret=interpret)
    m_r, d_r = mlen[:, ctx:], mdist[:, ctx:]
    take_r, starts_r = take[:, ctx:], starts[:, ctx:]
    if squeeze:
        take_r, starts_r, m_r = _squeeze_stage(
            windows[:, ctx:], m_r, d_r, take_r, starts_r, valid_lens,
            blk=blk)
    seg = encode2.seg_size(S, blk)
    vals, bits, total_bits, kind = encode2.build_fields(
        windows[:, ctx:], m_r, d_r, starts_r,
        take_r, valid_lens, finals, S, seg)
    words, tbits = pk.pack_fields(vals, bits, _nwr(S, seg),
                                  interpret=interpret)
    return words, tbits, kind


def _words_to_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """(B, nwr, 128) u32 LSB-first words -> (B, nwr*512) u8 stream."""
    B = words.shape[0]
    w = words.reshape(B, -1)
    planes = [((w >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8)
              for k in range(4)]
    return jnp.stack(planes, axis=-1).reshape(B, -1)


HASH_NONE, HASH_CRC32, HASH_ADLER32 = 0, 1, 2


@jax.jit
def _split_meta(meta_in: jnp.ndarray):
    B = (meta_in.shape[0] - 1) // 3
    return (meta_in[:B], meta_in[B:2 * B], meta_in[2 * B:3 * B],
            meta_in[3 * B])


@functools.partial(jax.jit, static_argnames=("hash_kind",))
def _compact_stage(words: jnp.ndarray, tbits: jnp.ndarray,
                   shards: jnp.ndarray, valid_lens: jnp.ndarray,
                   nb: jnp.ndarray, hash_kind: int = HASH_NONE):
    """(words, tbits) -> (buf, meta_out): splice the batch's shard
    streams in order on DEVICE so the host fetches exactly the
    compressed bytes plus one small meta array, instead of the padded
    (B, nwr, 128) word grid.  meta_out i32 = [total_bytes |
    byte_lens(B) | hash words]; hash words are raw per-row CRC32 over
    the padded width (hash_kind=1, host fixup via checksum.crc32_fixup)
    or interleaved Adler s1|s2 (hash_kind=2), sharing the shard upload.

    Replaces the reference's streaming writer drain (bit_writer.zig:63-97)
    as the device->host seam; stream bytes are identical to
    encode_batch_staged's per-shard slices."""
    B = words.shape[0]
    live = jnp.arange(B, dtype=jnp.int32) < nb
    blens = jnp.where(live, tbits // 8, 0)
    offs = jnp.cumsum(blens) - blens
    total = offs[B - 1] + blens[B - 1]
    byts = _words_to_bytes(words)
    L = byts.shape[1]
    # forward-order placement: update i may clobber bytes past its true
    # length, but every later shard rewrites its own region afterwards,
    # and the last shard's spill stays inside the B*L cap
    buf = jnp.zeros((B * L,), jnp.uint8)
    for i in range(B):
        buf = jax.lax.dynamic_update_slice(buf, byts[i], (offs[i],))

    parts = [total[None].astype(jnp.int32), blens.astype(jnp.int32)]
    if hash_kind == HASH_CRC32:
        parts.append(checksum._crc32_rows_any(shards).astype(jnp.int32))
    elif hash_kind == HASH_ADLER32:
        s1, s2 = checksum._adler_rows_any(shards, valid_lens)
        parts.append(s1.astype(jnp.int32))
        parts.append(s2.astype(jnp.int32))
    return buf, jnp.concatenate(parts)


def encode_batch_packed(shards: jnp.ndarray, ctx0: jnp.ndarray,
                        meta_in: jnp.ndarray, *, S: int, ctx: int, K: int,
                        nw: int, lazy: bool, max_lazy: int, K3: int = 0,
                        squeeze: bool = False, blk: int = prs.PARSE_BLK,
                        hash_kind: int = HASH_NONE,
                        interpret: bool = False):
    """Device-compacted twin of encode_batch_staged for the host loop.

    meta_in (3B+1,) i32 = [ctx_lens | valid | finals | nb].  Stage-
    jitted (same programs as encode_batch_staged plus _compact_stage)
    so production shapes compile in minutes, not the fused program's
    tens of minutes."""
    ctx_lens, valid_lens, finals, nb = _split_meta(meta_in)
    windows = _prime_windows(shards, ctx0, ctx=ctx)
    mlen, mdist = match2.find_matches_fused(
        windows, ctx_lens, valid_lens, K=K, nw=nw, ctx=ctx, K3=K3,
        interpret=interpret)
    take, starts, mlen, mdist = _parse_stage(
        mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx, blk=blk,
        interpret=interpret)
    m_r, d_r = mlen[:, ctx:], mdist[:, ctx:]
    take_r, starts_r = take[:, ctx:], starts[:, ctx:]
    if squeeze:
        take_r, starts_r, m_r = _squeeze_stage(
            windows[:, ctx:], m_r, d_r, take_r, starts_r, valid_lens,
            blk=blk)
    seg = encode2.seg_size(S, blk)
    vals, bits, total_bits, kind = encode2.build_fields(
        windows[:, ctx:], m_r, d_r, starts_r,
        take_r, valid_lens, finals, S, seg)
    words, tbits = pk.pack_fields(vals, bits, _nwr(S, seg),
                                  interpret=interpret)
    return _compact_stage(words, tbits, shards, valid_lens, nb,
                          hash_kind=hash_kind)


class _ByteFetcher:
    """Pow2-row granular fetch of the compacted byte buffer: the slice
    shapes stay in a tiny static set so nothing recompiles per batch."""

    GR = 1 << 17                  # 128 KiB rows

    def __call__(self, buf, total: int) -> np.ndarray:
        cap = buf.shape[0]
        if total >= cap:
            return np.asarray(buf)[:total]
        rows_all = cap // self.GR
        rows = -(-max(total, 1) // self.GR)
        rows = min(1 << (rows - 1).bit_length(), rows_all)
        if rows * self.GR >= total:
            view = buf[:rows_all * self.GR].reshape(rows_all, self.GR)
            return np.asarray(view[:rows]).reshape(-1)[:total]
        return np.asarray(buf)[:total]


class _Fetcher:
    """Bucketed device->host fetch of the used word-row prefix."""

    def __init__(self):
        self.guess_rows = 16

    def __call__(self, words, tbits_dev):
        wslice = words[:, :min(self.guess_rows, words.shape[1]), :]
        try:
            wslice.copy_to_host_async()
        except AttributeError:
            pass
        tbits = np.asarray(tbits_dev)
        need = int(tbits.max()) if tbits.size else 0
        rows = -(-max(need, 1) // (32 * 128)) + 1
        rows = min(1 << (rows - 1).bit_length(), words.shape[1])
        self.guess_rows = rows
        if rows <= wslice.shape[1]:
            return np.asarray(wslice)[:, :rows, :], tbits
        return np.asarray(words[:, :rows, :]), tbits


def compress_device2(data: bytes, level: int = consts.LEVEL_DEFAULT,
                     container: Container = Container.GZIP,
                     shard_len: int = consts.SHARD_LEN,
                     ctx: int = CTX, batch: int = 64,
                     index: bool = True,
                     independent: bool = False,
                     interpret: bool = False,
                     fused: bool = False) -> bytes:
    """One-shot compress through the v2 device pipeline.

    When `index` is set (gzip only), the header carries an FLT1 EXTRA
    subfield with per-shard (compressed, output) byte lengths so
    jx.inflate2 can decode the member shard-parallel on device; standard
    gzip tools ignore the subfield (RFC 1952 §2.3.1.1).

    `independent` drops the cross-shard 32 KiB context priming (flagged
    in the index) so hosts can decode every shard concurrently
    (flate_tpu.pinflate) — ~0.5-1% larger streams."""
    if level not in LEVEL_KERNEL:
        raise ValueError(f"invalid level {level}")
    from .. import metrics
    with metrics.timed("device.compress", len(data), level=level) as _m:
        out = _compress_device2_impl(
            data, level, container, shard_len, ctx, batch, index,
            independent, interpret, fused)
        _m["bytes_out"] = len(out)
    return out


def _compress_device2_impl(data, level, container, shard_len, ctx, batch,
                           index, independent, interpret, fused) -> bytes:
    K, nw, lazy, max_lazy, K3, squeeze, blk = LEVEL_KERNEL[level]
    blk = min(blk, shard_len)
    while shard_len % blk:
        blk //= 2
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    S = shard_len
    nshards = max(1, -(-n // S))

    out = bytearray()
    comp_lens: list = []
    hasher = Hasher(container)
    # CRC32/Adler32 run on device per shard, sharing the encode upload,
    # and combine on host (GF(2) combine — checksums.py); the full-input
    # host hash was a serial term the north star forbids (and on true
    # multi-host no host holds the full input).  Opt out with
    # FLATE_TPU_HOST_HASH=1.  Reference rolls the hash inline with I/O:
    # container.zig:168-206.
    dev_hash = (container in (Container.GZIP, Container.ZLIB)
                and os.environ.get("FLATE_TPU_HOST_HASH") != "1")
    if not dev_hash:
        hasher.update(data)
    hash_kind = HASH_NONE
    if dev_hash:
        hash_kind = (HASH_CRC32 if container is Container.GZIP
                     else HASH_ADLER32)

    if fused:
        return _compress_fused_loop(
            arr, n, S, nshards, level, container, shard_len, ctx, batch,
            index, independent, interpret, hasher, dev_hash, out,
            comp_lens)

    # per-batch host work is three transfers: ONE async (B, S) upload,
    # ONE packed small upload ([ctx_lens | valid | finals | nb]), and
    # ONE packed small fetch; compressed bytes come back pre-spliced by
    # the device compaction in encode_batch_packed.  Row-0 context is
    # carried on DEVICE from the previous batch's last shard tail.
    zeros_ctx = jnp.zeros(ctx, dtype=jnp.uint8)
    # staging buffers are reused round-robin (DEPTH+1 covers the two
    # in-flight uploads plus the one being filled): a fresh 4 MiB
    # allocation per batch pays first-touch fault costs every time
    staging = [np.zeros((batch, S), dtype=np.uint8) for _ in range(3)]

    def dispatch(base_shard: int, ctx0_dev, sbuf_i: int):
        nb = min(batch, nshards - base_shard)
        lo0 = base_shard * S
        shards_np = staging[sbuf_i]
        take_n = max(0, min(n - lo0, batch * S))
        shards_np.reshape(-1)[:take_n] = arr[lo0:lo0 + take_n]
        if take_n < batch * S:
            shards_np.reshape(-1)[take_n:] = 0
        meta = np.zeros(3 * batch + 1, dtype=np.int32)
        if not independent:
            meta[:batch] = np.minimum(
                ctx, lo0 + np.arange(batch, dtype=np.int64) * S)
        v = meta[batch:2 * batch]
        for i in range(nb):
            v[i] = max(0, min(S, n - (base_shard + i) * S))
        if base_shard + nb == nshards:
            meta[2 * batch + nb - 1] = 1
        meta[3 * batch] = nb
        shards_dev = jax.device_put(shards_np)
        buf, meta_out = encode_batch_packed(
            shards_dev, ctx0_dev, jax.device_put(meta), S=S, ctx=ctx,
            K=K, nw=nw, lazy=lazy, max_lazy=max_lazy, K3=K3,
            squeeze=squeeze, blk=blk, hash_kind=hash_kind,
            interpret=interpret)
        try:
            meta_out.copy_to_host_async()
        except AttributeError:
            pass
        if independent:
            nxt_ctx = zeros_ctx
        else:
            # last ctx bytes of [carry | batch] (ctx may exceed S)
            kc = -(-ctx // S)
            rows = shards_dev[max(0, batch - kc):].reshape(-1)
            nxt_ctx = jnp.concatenate([ctx0_dev, rows])[-ctx:]
        return nb, buf, meta_out, nxt_ctx

    fetch = _ByteFetcher()
    bases = list(range(0, nshards, batch))
    # keep two batches in flight so the host-side fetch of batch j
    # overlaps device compute of j+1 AND the upload of j+2
    DEPTH = 2
    queue = []
    ctx_dev = zeros_ctx
    for b in bases[:DEPTH]:
        item = dispatch(b, ctx_dev, len(queue) % len(staging))
        ctx_dev = item[3]
        queue.append(item)
    ndisp = min(DEPTH, len(bases))
    for j in range(len(bases)):
        nb, buf, meta_out, _ = queue.pop(0)
        if ndisp < len(bases):
            item = dispatch(bases[ndisp], ctx_dev, ndisp % len(staging))
            ctx_dev = item[3]
            queue.append(item)
            ndisp += 1
        meta_np = np.asarray(meta_out)
        total = int(meta_np[0])
        blens = meta_np[1:1 + batch]
        out += fetch(buf, total).tobytes()
        comp_lens.extend(int(x) for x in blens[:nb])
        if dev_hash:
            base_shard = bases[j]
            valid = np.minimum(
                S, np.maximum(
                    0, n - (base_shard + np.arange(nb)) * S)).astype(
                        np.int64)
            if hash_kind == HASH_CRC32:
                crcs = checksum.crc32_fixup(
                    meta_np[1 + batch:1 + batch + nb].astype(np.uint32),
                    valid, checksum.padded_width(S))
                for i in range(nb):
                    ln = int(valid[i])
                    if ln:
                        hasher.value = crc32_combine(
                            hasher.value, int(crcs[i]), ln)
                    hasher.nbytes += ln
            else:
                s1 = meta_np[1 + batch:1 + batch + nb].astype(np.uint32)
                s2 = meta_np[1 + 2 * batch:1 + 2 * batch + nb].astype(
                    np.uint32)
                adl = checksum.adler_finalize(s1, s2, valid)
                for i in range(nb):
                    ln = int(valid[i])
                    if ln:
                        hasher.value = adler32_combine(
                            hasher.value, int(adl[i]), ln)
                    hasher.nbytes += ln

    return _assemble(container, index, independent, nshards, S, n,
                     comp_lens, out, hasher)


class DeviceEncoder:
    """Stateful streaming device encoder producing raw DEFLATE bytes.

    Feed `encode(chunk, final=...)` arbitrary byte chunks (shard-sized
    or larger to amortize the device dispatch); each call returns the
    spliced shard streams for that chunk.  Every shard stream ends with
    the empty-stored sync marker (encode2.py trailer), so each call's
    output is a byte-aligned, decodable prefix extension — the device
    twin of the reference's flush contract (deflate.zig:325-337).  The
    32 KiB match context is carried ON DEVICE between calls; a preset
    dictionary primes it (v1 parity: v1/deflate/compressor.zig:205-224).

    Backs the public streaming Compressor(device=True) (api.py) and the
    one-shot device path."""

    def __init__(self, level: int = consts.LEVEL_DEFAULT,
                 shard_len: int = consts.SHARD_LEN, ctx: int = CTX,
                 batch: int = 64, dictionary: bytes | None = None,
                 interpret: bool = False):
        if level not in LEVEL_KERNEL:
            raise ValueError(f"invalid level {level}")
        K, nw, lazy, max_lazy, K3, squeeze, blk = LEVEL_KERNEL[level]
        blk = min(blk, shard_len)
        while shard_len % blk:
            blk //= 2
        self._kern = dict(K=K, nw=nw, lazy=lazy, max_lazy=max_lazy, K3=K3,
                          squeeze=squeeze, blk=blk, interpret=interpret)
        self.S, self.ctx, self.batch = shard_len, ctx, batch
        # host-side history tail (<= ctx bytes): the device carry inside
        # a call pads the tail shard with zeros, so cross-CALL context
        # must be rebuilt from the true byte history
        self._tail = bytearray((dictionary or b"")[-ctx:])
        self._finished = False
        self.comp_lens: list = []    # per-shard compressed byte lengths
        self.out_lens: list = []     # per-shard input byte lengths

    def encode(self, data: bytes, final: bool = False) -> bytes:
        """Encode `data` completely (padding the tail shard) and return
        its deflate bytes.  final=True closes the stream."""
        assert not self._finished, "encode after final"
        self._finished = final
        arr = np.frombuffer(data, dtype=np.uint8)
        n, S, batch, ctx = arr.size, self.S, self.batch, self.ctx
        nshards = -(-n // S)
        if final and nshards == 0:
            nshards = 1
        hist = len(self._tail)
        ctx0 = np.zeros(ctx, dtype=np.uint8)
        if hist:
            ctx0[ctx - hist:] = np.frombuffer(self._tail, dtype=np.uint8)
        ctx_dev = jnp.asarray(ctx0)
        fetch = _ByteFetcher()
        pieces = []
        for base in range(0, nshards, batch):
            nb = min(batch, nshards - base)
            lo0 = base * S
            shards_np = np.zeros((batch, S), dtype=np.uint8)
            take_n = max(0, min(n - lo0, batch * S))
            shards_np.reshape(-1)[:take_n] = arr[lo0:lo0 + take_n]
            meta = np.zeros(3 * batch + 1, dtype=np.int32)
            meta[:batch] = np.minimum(
                ctx, hist + lo0 + np.arange(batch, dtype=np.int64) * S)
            v = meta[batch:2 * batch]
            for i in range(nb):
                v[i] = max(0, min(S, n - (base + i) * S))
            if final and base + nb == nshards:
                meta[2 * batch + nb - 1] = 1
            meta[3 * batch] = nb
            shards_dev = jax.device_put(shards_np)
            buf, meta_out = encode_batch_packed(
                shards_dev, ctx_dev, jax.device_put(meta),
                S=S, ctx=ctx, hash_kind=HASH_NONE, **self._kern)
            kc = -(-ctx // S)
            rows = shards_dev[max(0, batch - kc):].reshape(-1)
            ctx_dev = jnp.concatenate([ctx_dev, rows])[-ctx:]
            meta_np = np.asarray(meta_out)
            pieces.append(fetch(buf, int(meta_np[0])).tobytes())
            self.comp_lens.extend(
                int(x) for x in meta_np[1:1 + nb])
            self.out_lens.extend(int(v[i]) for i in range(nb))
        if n >= ctx:
            self._tail = bytearray(bytes(data[-ctx:]))
        else:
            self._tail = (self._tail + bytes(data))[-ctx:]
        return b"".join(pieces)


def _assemble(container, index, independent, nshards, S, n, comp_lens,
              out, hasher) -> bytes:
    if index and container is Container.GZIP and nshards <= 8000:
        from .. import shard_index
        out_lens = [min(S, n - i * S) if n else 0 for i in range(nshards)]
        flags = shard_index.FLAG_INDEPENDENT if independent else 0
        meta = GzipMetadata(
            extra=shard_index.build_index_extra(comp_lens, out_lens, flags))
        header = write_header(container, meta)
    else:
        header = write_header(container)
    return header + bytes(out) + write_footer(container, hasher)


def _compress_fused_loop(arr, n, S, nshards, level, container, shard_len,
                         ctx, batch, index, independent, interpret,
                         hasher, dev_hash, out, comp_lens) -> bytes:
    """Original word-grid fetch loop over the single-jit fused program —
    kept as the A/B twin of the packed/staged production path."""
    K, nw, lazy, max_lazy, K3, squeeze, blk = LEVEL_KERNEL[level]
    blk = min(blk, shard_len)
    while shard_len % blk:
        blk //= 2

    def dispatch(base_shard: int):
        nb = min(batch, nshards - base_shard)
        lo0 = base_shard * S
        shards_np = np.zeros((batch, S), dtype=np.uint8)
        take_n = min(n - lo0, nb * S)
        shards_np.reshape(-1)[:take_n] = arr[lo0:lo0 + take_n]
        c0 = 0 if independent else min(ctx, lo0)
        ctx0 = np.zeros(ctx, dtype=np.uint8)
        if c0:
            ctx0[ctx - c0:] = arr[lo0 - c0:lo0]
        if independent:
            ctx_lens = np.zeros(batch, dtype=np.int32)
        else:
            ctx_lens = np.minimum(
                ctx, lo0 + np.arange(batch, dtype=np.int64) * S
            ).astype(np.int32)
        valid = np.full(batch, S, dtype=np.int32)
        for i in range(nb):
            valid[i] = min(S, n - (base_shard + i) * S)
        valid[nb:] = 0
        finals = np.zeros(batch, dtype=np.int32)
        if base_shard + nb == nshards:
            finals[nb - 1] = 1
        shards_dev = jnp.asarray(shards_np)
        words, tbits, kind = encode_batch(
            shards_dev, jnp.asarray(ctx0),
            jnp.asarray(ctx_lens), jnp.asarray(valid),
            jnp.asarray(finals), S=S, ctx=ctx, K=K, nw=nw, lazy=lazy,
            max_lazy=max_lazy, K3=K3, squeeze=squeeze, blk=blk,
            interpret=interpret)
        hash_dev = None
        if dev_hash:
            if container is Container.GZIP:
                hash_dev = checksum._crc32_rows_any(shards_dev)
            else:
                hash_dev = checksum._adler_rows_any(
                    shards_dev, jnp.asarray(valid))
        return nb, words, tbits, hash_dev, valid

    fetch = _Fetcher()
    bases = list(range(0, nshards, batch))
    DEPTH = 2
    queue = [dispatch(b) for b in bases[:DEPTH]]
    for j in range(len(bases)):
        nb, words, tbits, hash_dev, valid = queue.pop(0)
        if j + DEPTH < len(bases):
            queue.append(dispatch(bases[j + DEPTH]))
        words_np, tbits_np = fetch(words, tbits)
        flat = words_np.reshape(words_np.shape[0], -1)
        for i in range(nb):
            tb = int(tbits_np[i])
            assert tb % 8 == 0, "shard streams must be byte-aligned"
            comp_lens.append(tb // 8)
            out += flat[i].tobytes()[:tb // 8]
        if dev_hash:
            if container is Container.GZIP:
                crcs = checksum.crc32_fixup(
                    np.asarray(hash_dev)[:nb], valid[:nb],
                    checksum.padded_width(S))
                for i in range(nb):
                    ln = int(valid[i])
                    if ln:
                        hasher.value = crc32_combine(
                            hasher.value, int(crcs[i]), ln)
                    hasher.nbytes += ln
            else:
                s1, s2 = hash_dev
                adl = checksum.adler_finalize(
                    np.asarray(s1)[:nb], np.asarray(s2)[:nb], valid[:nb])
                for i in range(nb):
                    ln = int(valid[i])
                    if ln:
                        hasher.value = adler32_combine(
                            hasher.value, int(adl[i]), ln)
                    hasher.nbytes += ln
    return _assemble(container, index, independent, nshards, S, n,
                     comp_lens, out, hasher)
