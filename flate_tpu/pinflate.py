"""Thread-parallel host decode of FLT1-indexed members.

The native C decoder releases the GIL for the duration of each ctypes
call, so shards of an index-flagged *independent* member (written by
`jx.pipeline2.compress_device2(..., independent=True)`) decode on all
cores concurrently — each shard is a self-contained deflate stream
ending in a sync flush, with no cross-shard history.  Per-shard CRC32s
are combined with the GF(2) operator instead of re-hashing the output.

This is the decode-side counterpart of pigz-style sharding (the
reference ecosystem has no parallel decoder; rapidgzip-style tools
need speculation because gzip carries no index — our FLT1 subfield
removes the need).  Members without the independent flag fall back to
the sequential decoder.
"""

from __future__ import annotations

import functools
import os
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor

from . import native
from .containers import Container, parse_header
from .errors import EndOfStream, WrongGzipChecksum, WrongGzipSize
from .shard_index import FLAG_INDEPENDENT, parse_index_extra


def decompress_indexed(data: bytes, threads: int | None = None,
                       verify: bool = True) -> bytes:
    """Decode one FLT1-indexed gzip member with a thread pool.

    Falls back to the sequential decoder when the member carries no
    independent-shard index or the native decoder is unavailable."""
    from . import metrics
    with metrics.timed("host.decompress_parallel", len(data)) as _m:
        res = try_decompress_indexed(data, 0, verify, threads)
        if res is not None:
            _m["bytes_out"] = len(res[0])
            return res[0]
        from .inflate import decompress_member
        out, _end = decompress_member(data, 0, Container.GZIP, verify)
        _m["bytes_out"] = len(out)
    return out


def try_decompress_indexed(data: bytes, offset: int = 0,
                           verify: bool = True,
                           threads: int | None = None):
    """(bytes, end_offset) for an independent indexed member at
    `offset`, or None when the fast path does not apply.  Called from
    inflate.decompress_member so `ft.gzip.decompress` transparently
    parallelizes on flagged members."""
    try:
        hdr_len, meta = parse_header(Container.GZIP, data[offset:])
    except Exception:
        return None
    idx = parse_index_extra(meta.extra) if meta and meta.extra else None
    if idx is None or not (idx[2] & FLAG_INDEPENDENT) \
            or not native.inflate_available():
        return None
    comp_lens, out_lens, _flags = idx
    n = len(comp_lens)
    # the index is attacker-controlled header data: bounds-check before
    # trusting it (oversized claims fall back to the strict sequential
    # decoder, which enforces the real protocol errors)
    if n == 0 or int(comp_lens.sum()) > len(data) - offset \
            or int(out_lens.max(initial=0)) > (1 << 30) \
            or int(out_lens.sum()) > 1040 * max(1, int(comp_lens.sum())):
        # 1040x > deflate's max expansion (~1032x); a crafted index
        # cannot drive allocations beyond what the payload could encode
        return None
    import numpy as np
    starts = [offset + hdr_len] * (n + 1)
    oofs = [0] * (n + 1)
    for i in range(n):
        starts[i + 1] = starts[i] + int(comp_lens[i])
        oofs[i + 1] = oofs[i] + int(out_lens[i])
    out_total = oofs[n]
    # shards decode straight into their regions of ONE output buffer
    # with the one-shot fast loop — no 64K ring, no per-shard bytes
    # objects, no final join copy.  The buffer is pre-faulted with one
    # linear fill: scattered first-touch faults inside the decode loop
    # measured ~15x slower than a streaming memset on this VM
    out = np.empty(out_total, dtype=np.uint8)
    out.fill(0)

    workers = threads or min(32, os.cpu_count() or 1)
    # one task per worker decoding a contiguous shard range: per-call
    # GIL handoffs convoy at 256 tasks (~7 ms/shard measured), while a
    # range task re-enters Python only once per shard
    spans = []
    per = -(-n // workers)
    for lo in range(0, n, per):
        spans.append((lo, min(lo + per, n)))

    def decode_span(span):
        lo, hi = span
        crcs = []
        for i in range(lo, hi):
            want = int(out_lens[i])
            if want and not native.inflate_shard_into(
                    data, starts[i], starts[i + 1] - starts[i],
                    out, oofs[i], want):
                raise RuntimeError("native decoder unavailable")
            # per-shard CRC inside the pool (the C calls release the
            # GIL); combined below with the GF(2) shift operator
            if verify and want:
                c = native.crc32(out[oofs[i]:oofs[i + 1]])
                crcs.append(zlib.crc32(out[oofs[i]:oofs[i + 1]])
                            if c is None else c)
            else:
                crcs.append(0)
        return crcs

    with ThreadPoolExecutor(max_workers=workers) as pool:
        crcs = [c for span_crcs in pool.map(decode_span, spans)
                for c in span_crcs]

    total = starts[n]
    if verify:
        if len(data) < total + 8:
            raise EndOfStream("gzip footer truncated")
        crc, isize = struct.unpack_from("<II", data, total)
        got = 0
        for i, c in enumerate(crcs):
            got = _combine_cached(got, c, int(out_lens[i]))
        if crc != (got & 0xFFFFFFFF):
            raise WrongGzipChecksum(f"{crc:#x} != {got & 0xFFFFFFFF:#x}")
        if isize != (out_total & 0xFFFFFFFF):
            raise WrongGzipSize(f"{isize} != {out_total}")
    return out.tobytes(), total + 8


@functools.lru_cache(maxsize=64)
def _shift_cols(len2: int):
    """Columns of the finalized-crc shift-by-len2-zero-bytes operator
    (crc32_combine(x, 0, len2) is linear in x) + the affine constant."""
    from .checksums import crc32_combine
    z = crc32_combine(0, 0, len2)
    return tuple(crc32_combine(1 << i, 0, len2) ^ z
                 for i in range(32)), z


def _combine_cached(crc1: int, crc2: int, len2: int) -> int:
    """crc(A||B) with the per-length operator cached — shards share one
    length, so the GF(2) matrix powers are built once, not per shard."""
    if len2 <= 0:
        return crc1 & 0xFFFFFFFF
    cols, z = _shift_cols(len2)
    y = z
    x = crc1
    i = 0
    while x:
        if x & 1:
            y ^= cols[i]
        x >>= 1
        i += 1
    return (y ^ crc2) & 0xFFFFFFFF
