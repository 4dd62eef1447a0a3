"""End-to-end jitted compression pipeline over batches of shards.

Orchestration (host code is only decision + splicing; all heavy work is two
jitted device phases):

  phase1 (device): match search -> lazy parse -> token compaction ->
                   litlen/dist histograms          [batch-native, no vmap]
  host:            block-type decision (stored/fixed/dynamic/literal-only)
                   + canonical Huffman code construction from histograms
  phase2 (device): bit-pack token bodies with the chosen code tables
  host:            dynamic headers, EOB, sync-flush markers, container
                   framing, checksum (zlib host CRC until the Pallas CRC
                   kernel lands)

Shard shapes are static (shard_len + ctx bytes); the final partial shard is
encoded by the host spec path (flate_tpu.deflate) — identical stream format.
"""

from __future__ import annotations

import functools
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from .. import block, consts, huffman, tables
from ..bitpack import BitSink
from ..containers import Container, Hasher, write_footer, write_header
from . import encode as enc
from . import match as mtc
from . import parse as prs


@functools.partial(jax.jit,
                   static_argnames=("ctx", "K", "K3", "lazy", "max_lazy",
                                    "nwords"))
def phase1(windows: jnp.ndarray, ctx_lens: jnp.ndarray, *, ctx: int,
           K: int, K3: int, lazy: bool, max_lazy: int, nwords: int = 8):
    """windows: (B, ctx + shard_len) uint8.  Returns token fields + hists.
    Batch-native throughout — no vmap (vmapped scatters/sorts compile
    pathologically on TPU)."""
    mlen, mdist = mtc.find_matches_device(
        windows, ctx_lens, K=K, K3=K3, min_len=consts.MIN_MATCH_LEN,
        ctx=ctx, nwords=nwords)
    # the Pallas serial-walk kernel is ~12x faster than pointer doubling
    # on TPU; on CPU backends the doubling path is used (the interpreted
    # walk is equivalent — tests/test_jx.py pins that — but slow)
    if jax.default_backend() == "cpu":
        starts = prs.parse_doubling(
            mlen, mdist, start=ctx, lazy=lazy, max_lazy=max_lazy)
    else:
        starts = prs.parse_walk(
            mlen, mdist, start=ctx, lazy=lazy, max_lazy=max_lazy)
    take, _ = prs.decide(mlen, mdist, lazy, max_lazy)
    tok = enc.compact_tokens(windows[:, ctx:], mlen[:, ctx:],
                             mdist[:, ctx:], starts[:, ctx:],
                             take[:, ctx:])
    ll, dd = enc.histograms(tok)
    # pack all small per-shard outputs into ONE array: each device->host
    # transfer pays ~15-30ms of tunnel latency, so one fetch per batch
    # instead of three
    stats = jnp.concatenate(
        [ll, dd, tok["ntokens"][:, None]], axis=1)
    return tok, stats


def unpack_stats(stats: np.ndarray):
    """(hll, hdd, ntokens) from the packed phase1 stats array."""
    hll = stats[:, :consts.NUM_LITLEN]
    hdd = stats[:, consts.NUM_LITLEN:consts.NUM_LITLEN + consts.NUM_DIST]
    ntokens = stats[:, -1]
    return hll, hdd, ntokens


@functools.partial(jax.jit, static_argnames=("nt",))
def phase2(tok: dict, ll_packed: jnp.ndarray, d_packed: jnp.ndarray,
           nt: int = 0):
    """Pack token bodies with per-shard code tables (B, 286)/(B, 30).

    nt: optional static bucket — only the first nt token slots are packed
    (the caller picks the smallest power-of-two bucket >= max ntokens,
    typically 4x smaller than the worst case)."""
    if nt:
        tok = {k: (v[:, :nt] if getattr(v, "ndim", 0) == 2 else v)
               for k, v in tok.items()}
    return enc.pack_tokens(tok, ll_packed, d_packed)


def phase2_bucketed(tok: dict, llp: np.ndarray, dp: np.ndarray,
                    maxt: int):
    """Host wrapper: pick a power-of-two token bucket >= maxt."""
    full = tok["live"].shape[1]
    nt = min(full, max(4096, 1 << (max(1, maxt - 1)).bit_length()))
    return phase2(tok, jnp.asarray(llp), jnp.asarray(dp), nt=nt)


@functools.partial(jax.jit, static_argnames=("ctx",))
def build_windows(shards: jnp.ndarray, ctx0: jnp.ndarray, *, ctx: int):
    """Assemble (B, ctx+S) context-primed windows ON DEVICE from raw
    (B, S) shards: row b's context is row b-1's tail (batch roll), row 0
    takes the host-provided ctx0 carry-over.  Saves a quarter of the
    host->device traffic and all host-side window copies."""
    B, S = shards.shape
    tails = shards[:, S - ctx:]
    prev = jnp.concatenate([ctx0[None, :], tails[:-1]], axis=0)
    return jnp.concatenate([prev, shards], axis=1)


def fetch_words(words, tbits: np.ndarray) -> np.ndarray:
    """Device->host transfer of only the used prefix of the pack buffer
    (rounded up to a power of two to bound recompiles).  The worst-case
    buffer is 48 bits/token; real streams use ~6x less."""
    need = int(-(-int(tbits.max()) // 32)) if tbits.size else 1
    n = max(1024, 1 << (need - 1).bit_length())
    n = min(n, words.shape[1])
    return np.asarray(words[:, :n])


class _WordFetcher:
    """Latency-hiding fetch of the packed words: issues an async transfer
    of a self-adjusting guessed prefix in parallel with the (tiny) tbits
    transfer, refetching only when the guess was short."""

    def __init__(self):
        self.guess = 1 << 14

    def __call__(self, words, tbits_dev) -> tuple[np.ndarray, np.ndarray]:
        g = min(self.guess, words.shape[1])
        wslice = words[:, :g]
        try:
            wslice.copy_to_host_async()
        except AttributeError:
            pass
        tbits = np.asarray(tbits_dev)
        need = int(-(-int(tbits.max()) // 32)) if tbits.size else 1
        n = max(1024, 1 << (need - 1).bit_length())
        n = min(n, words.shape[1])
        self.guess = n
        if n <= g:
            return np.asarray(wslice)[:, :n], tbits
        return np.asarray(words[:, :n]), tbits


def _packed_table(codes: np.ndarray, lens: np.ndarray, n: int) -> np.ndarray:
    t = np.zeros(n, dtype=np.uint32)
    t[:codes.size] = codes.astype(np.uint32) | (lens.astype(np.uint32) << 24)
    return t


class _ShardPlan:
    __slots__ = ("kind", "ll_lens", "d_lens", "header")

    def __init__(self, kind, ll_lens=None, d_lens=None):
        self.kind = kind
        self.ll_lens = ll_lens
        self.d_lens = d_lens


def _dynamic_header_fields(final, ll_lens, d_lens):
    """(values, bits) lists for a dynamic block header (host, tiny)."""
    cg_items, hlit, hdist = block.generate_codegen(ll_lens, d_lens)
    cg_freq = block._codegen_freq(cg_items)
    cg_lens = huffman.huffman_code_lengths(cg_freq, consts.MAX_CODEGEN_BITS)
    cg_codes = tables.canonical_codes(cg_lens)
    hclen = block._hclen(cg_lens)
    hv = [int(final) | (2 << 1), hlit - 257, hdist - 1, hclen - 4]
    hb = [3, 5, 5, 4]
    for i in range(hclen):
        hv.append(int(cg_lens[tables.CODEGEN_ORDER[i]]))
        hb.append(3)
    for sym, ev, eb in cg_items:
        hv.append(int(cg_codes[sym]))
        hb.append(int(cg_lens[sym]))
        if eb:
            hv.append(ev)
            hb.append(eb)
    dyn_header_bits = sum(hb)
    return hv, hb, dyn_header_bits


def plan_shards(hists_ll: np.ndarray, hists_d: np.ndarray,
                shard_views: list[np.ndarray]) -> list[_ShardPlan]:
    """Choose block representation per shard and build its code tables."""
    plans = []
    for b in range(hists_ll.shape[0]):
        freq_ll = hists_ll[b].astype(np.int64)
        freq_d = hists_d[b].astype(np.int64)
        ll_lens = huffman.huffman_code_lengths(freq_ll, consts.MAX_CODE_BITS)
        d_lens = huffman.huffman_code_lengths(freq_d, consts.MAX_CODE_BITS)
        if not d_lens.any():
            d_lens[0] = 1
        _, _, dyn_header = _dynamic_header_fields(False, ll_lens, d_lens)
        body = huffman.bit_length(freq_ll, ll_lens) + \
            huffman.bit_length(freq_d, d_lens) + \
            block._extra_bits_cost(freq_ll, freq_d)
        dyn = dyn_header + body
        fix = block.fixed_size(freq_ll, freq_d)
        sto = block.stored_size(shard_views[b].size, 0)
        # literal-only alternative (LZ hurts on e.g. digit streams); gate
        # the exact build on the entropy lower bound to skip the cost when
        # tokens clearly win
        lit = sto + 1
        lit_freq = np.bincount(shard_views[b], minlength=consts.NUM_LITLEN
                               ).astype(np.int64)[:consts.NUM_LITLEN]
        nz = lit_freq[lit_freq > 0]
        if nz.size:
            total = nz.sum()
            entropy_bits = float((nz * (np.log2(total) - np.log2(nz))).sum())
            if entropy_bits < min(dyn, fix):
                lit_freq[consts.END_OF_BLOCK] += 1
                lit_lens = huffman.huffman_code_lengths(
                    lit_freq, consts.MAX_CODE_BITS)
                lit_d = np.zeros(consts.NUM_DIST, dtype=np.int32)
                lit_d[0] = 1
                _, _, lit_header = _dynamic_header_fields(False, lit_lens,
                                                          lit_d)
                lit = lit_header + huffman.bit_length(lit_freq, lit_lens)

        best = min((dyn, "dynamic"), (fix, "fixed"), (sto, "stored"),
                   (lit, "literal"), key=lambda t: t[0])[1]
        if best == "dynamic":
            plans.append(_ShardPlan("dynamic", ll_lens, d_lens))
        elif best == "fixed":
            plans.append(_ShardPlan(
                "fixed",
                tables.FIXED_LITLEN_LENS[:consts.NUM_LITLEN].copy(),
                tables.FIXED_DIST_LENS[:consts.NUM_DIST].copy()))
        elif best == "literal":
            plans.append(_ShardPlan("literal"))
        else:
            plans.append(_ShardPlan("stored"))
    return plans


def emit_shard(sink: BitSink, plan: _ShardPlan, words: np.ndarray,
               tbits: int, shard_view: np.ndarray, final: bool) -> None:
    """Splice one shard's chosen representation into the stream."""
    if plan.kind == "stored":
        block.write_stored(sink, shard_view.tobytes(), final)
    elif plan.kind == "literal":
        block.write_block(sink, block.Tokens.literals(shard_view), final,
                          raw=shard_view.tobytes())
    else:
        if plan.kind == "fixed":
            hv, hb = [int(final) | (1 << 1)], [3]
        else:
            hv, hb, _ = _dynamic_header_fields(final, plan.ll_lens,
                                               plan.d_lens)
        sink.append_fields(np.asarray(hv, dtype=np.uint64),
                           np.asarray(hb, dtype=np.int64))
        sink.append_packed(words.copy(), tbits)
        ll_codes = _packed_table(tables.canonical_codes(plan.ll_lens),
                                 plan.ll_lens, consts.NUM_LITLEN)
        eobe = int(ll_codes[consts.END_OF_BLOCK])
        sink.append_fields(np.asarray([eobe & 0xFFFFFF], dtype=np.uint64),
                           np.asarray([eobe >> 24], dtype=np.int64))


TIMING = os.environ.get("FLATE_TPU_TIMING", "") not in ("", "0")
timings: dict = defaultdict(float)


class _T:
    """Phase timer (enabled via FLATE_TPU_TIMING=1); forces device sync."""

    def __init__(self, name, *sync):
        self.name = name
        self.sync = sync

    def __enter__(self):
        if TIMING:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if TIMING:
            for s in self.sync:
                jax.block_until_ready(s)
            timings[self.name] += time.perf_counter() - self.t0


def compress_device(data: bytes, level: int = consts.LEVEL_DEFAULT,
                    container: Container = Container.GZIP,
                    shard_len: int = consts.SHARD_LEN,
                    ctx: int = mtc.CTX,
                    batch: int = 8) -> bytes:
    """One-shot compress with the TPU pipeline."""
    if level not in consts.LEVEL_PARAMS:
        raise ValueError(f"invalid level {level}")
    K, _nice, lazy, max_lazy = consts.LEVEL_PARAMS[level]
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    nfull = n // shard_len

    sink = BitSink()
    out = bytearray()
    out += write_header(container)
    hasher = Hasher(container)
    hasher.update(data)  # host CRC/Adler (device checksum kernel: see kernels/)

    def dispatch(base: int):
        """Enqueue phase1 for one batch; returns everything the host side
        needs later.  Device work proceeds asynchronously, so dispatching
        batch j+1 before consuming batch j overlaps host planning/splicing
        with device compute."""
        nb = min(batch, nfull - base)
        lo0 = base * shard_len
        # pad the final batch to a fixed shape (avoids a second compile)
        shards_np = np.zeros((batch, shard_len), dtype=np.uint8)
        shards_np[:nb] = arr[lo0:lo0 + nb * shard_len].reshape(nb, shard_len)
        c0 = min(ctx, lo0)
        ctx0 = np.zeros(ctx, dtype=np.uint8)
        ctx0[ctx - c0:] = arr[lo0 - c0:lo0]
        ctx_lens = np.full(batch, ctx, dtype=np.int32)
        ctx_lens[0] = c0
        shard_views = [shards_np[i] for i in range(nb)]
        with _T("h2d+build_windows"):
            windows = build_windows(jnp.asarray(shards_np),
                                    jnp.asarray(ctx0), ctx=ctx)
            cl_dev = jnp.asarray(ctx_lens)
        tok, stats = phase1(windows, cl_dev, ctx=ctx, K=K,
                            K3=min(8, K), lazy=lazy, max_lazy=max_lazy,
                            nwords=16 if level >= 6 else 8)
        return base, nb, shard_views, tok, stats

    fetch = _WordFetcher()
    bases = list(range(0, nfull, batch))
    inflight = dispatch(bases[0]) if bases else None
    for j in range(len(bases)):
        base, nb, shard_views, tok, stats = inflight
        if j + 1 < len(bases):
            inflight = dispatch(bases[j + 1])
        with _T("phase1(sync)"):
            stats_np = np.asarray(stats)
            hll, hdd, ntokens = unpack_stats(stats_np)
        with _T("plan(host)"):
            plans = plan_shards(hll[:nb], hdd[:nb], shard_views)
            llp = np.zeros((batch, consts.NUM_LITLEN), dtype=np.uint32)
            dp = np.zeros((batch, consts.NUM_DIST), dtype=np.uint32)
            for i, p in enumerate(plans):
                if p.kind in ("dynamic", "fixed"):
                    llp[i] = _packed_table(
                        tables.canonical_codes(p.ll_lens), p.ll_lens,
                        consts.NUM_LITLEN)
                    dp[i] = _packed_table(
                        tables.canonical_codes(p.d_lens), p.d_lens,
                        consts.NUM_DIST)
        with _T("phase2"):
            words, tbits = phase2_bucketed(tok, llp, dp,
                                           int(ntokens[:nb].max()))
        with _T("d2h"):
            words, tbits = fetch(words, tbits)
        with _T("splice(host)"):
            for i, p in enumerate(plans):
                final = (base + i == nfull - 1) and (n % shard_len == 0)
                emit_shard(sink, p, words[i], int(tbits[i]),
                           shard_views[i], final)
                if not final:
                    block.write_flush_marker(sink)

    # remainder (and empty input) via the host spec path
    rem = arr[nfull * shard_len:]
    if rem.size or nfull == 0:
        from ..deflate import tokenize_shard
        ctx_bytes = arr[max(0, nfull * shard_len - consts.MAX_DISTANCE):
                        nfull * shard_len]
        toks = tokenize_shard(rem, ctx_bytes if ctx_bytes.size else None,
                              level)
        block.write_block(sink, toks, final=True, raw=rem.tobytes())

    sink.align_to_byte()
    out += sink.getvalue()
    out += write_footer(container, hasher)
    return bytes(out)
