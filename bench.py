"""Benchmark harness — encode/decode suite with baseline comparison.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline: level-6 gzip encode GB/s/chip through the v2 device pipeline
(reference: 1824.6 ms for 177,257,685 B on one Apple M1 core ≈ 0.0971
GB/s — BASELINE.md).  Detail carries the per-level encode ladder, the
four-corpus inflate bench (bin/inflate_bench.zig parity), compressed
sizes vs zlib, and compile/transfer accounting.  Corpora are
deterministic in-repo stand-ins (zero egress; the originals are
network-fetched).

Env knobs: BENCH_CORPUS_MB (default 64), BENCH_LEVEL (6),
BENCH_LADDER=none|small|full (small: levels 1/6/9), BENCH_PIPE=v2|v1.
"""

import json
import os
import sys
import time
import zlib

BASELINE_GBPS = 177_257_685 / 1.8246 / 1e9  # reference level-6, readme.md:25
BASELINE_DEC_GBPS = 177_244_160 / 0.36436 / 1e9  # readme.md:47

CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "64"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "6"))
LADDER = os.environ.get("BENCH_LADDER", "small")
PIPE = os.environ.get("BENCH_PIPE", "v2")


def build_corpus(size: int) -> bytes:
    """Deterministic tar-like corpus from in-repo source text."""
    import glob
    parts = []
    for pat in ("/root/repo/flate_tpu/**/*.py", "/root/repo/tests/**/*.py",
                "/root/repo/*.md", "/root/repo/tests/data/*.txt"):
        for f in sorted(glob.glob(pat, recursive=True)):
            try:
                with open(f, "rb") as fh:
                    parts.append(fh.read())
            except OSError:
                pass
    seed = b"".join(parts)
    if not seed:
        seed = b"flate_tpu bench corpus seed " * 1000
    reps = size // len(seed) + 1
    return (seed * reps)[:size]


def text_corpus(size: int) -> bytes:
    with open("/root/repo/tests/data/rfc1951.txt", "rb") as fh:
        t = fh.read()
    return (t * (size // len(t) + 1))[:size]


def mixed_corpus(size: int) -> bytes:
    import numpy as np
    rng = np.random.default_rng(11)
    blocks = []
    n = 0
    t = text_corpus(1 << 16)
    while n < size:
        blocks.append(t)
        r = rng.integers(0, 256, 1 << 14, dtype=np.uint8).tobytes()
        blocks.append(r)
        n += len(t) + len(r)
    return b"".join(blocks)[:size]


def bench_encode(compress, data, warm=True):
    if warm:
        t0 = time.time()
        compress(data[: 4 * 1024 * 1024])
        compile_s = time.time() - t0
    else:
        compile_s = 0.0
    t0 = time.time()
    blob = compress(data)
    dt = time.time() - t0
    return blob, dt, compile_s


def main() -> None:
    import gzip as pygz

    import flate_tpu as ft

    if PIPE == "v2":
        from flate_tpu.jx.pipeline2 import compress_device2 as dev_compress
    else:
        from flate_tpu.jx.pipeline import compress_device as dev_compress

    data = build_corpus(CORPUS_MB * 1024 * 1024)

    # ---- headline: level-6 encode ----
    blob, dt, compile_s = bench_encode(
        lambda d: dev_compress(d, level=LEVEL), data)
    gbps = len(data) / dt / 1e9
    ok = pygz.decompress(blob) == data
    zl = zlib.compress(data, LEVEL)
    detail = {
        "corpus_bytes": len(data),
        "compressed_bytes": len(blob),
        "ratio": round(len(blob) / len(data), 4),
        "zlib_bytes": len(zl),
        "size_vs_zlib": round(len(blob) / len(zl), 4),
        "roundtrip_ok": bool(ok),
        "encode_seconds": round(dt, 3),
        "compile_seconds": round(compile_s, 1),
        "level": LEVEL,
        "pipeline": PIPE,
    }

    # ---- encode ladder ----
    if LADDER != "none":
        levels = range(1, 10) if LADDER == "full" else (1, 6, 9)
        lad = {}
        ldata = data[: min(len(data), 16 * 1024 * 1024)]
        for lv in levels:
            try:
                b2, d2, _ = bench_encode(
                    lambda d: dev_compress(d, level=lv), ldata)
                lad[str(lv)] = {
                    "gbps": round(len(ldata) / d2 / 1e9, 4),
                    "bytes": len(b2),
                    "vs_zlib": round(
                        len(b2) / len(zlib.compress(ldata, lv)), 4),
                    "ok": pygz.decompress(b2) == ldata,
                }
            except Exception as e:             # pragma: no cover
                lad[str(lv)] = {"error": f"{type(e).__name__}: {e}"[:200]}
        detail["ladder"] = lad

    # ---- inflate bench: 4 corpora (reference bin/inflate_bench.zig) ----
    dec = {}
    corpora = {
        "srctar": data[: min(len(data), 32 * 1024 * 1024)],
        "text": text_corpus(3_359_630),
        "large": mixed_corpus(11_162_624),
        "cantrbry": mixed_corpus(2_821_120),
    }
    import struct

    decode_fn = ft.gzip.decompress
    dec_mode = "host-native"
    for name, cd in corpora.items():
        gz = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + \
            zlib.compress(cd, 6)[2:-4] + \
            struct.pack("<II", zlib.crc32(cd), len(cd) & 0xFFFFFFFF)
        decode_fn(gz)  # warm
        t0 = time.time()
        out = decode_fn(gz)
        d = time.time() - t0
        assert out == cd
        dec[name] = {"gbps": round(len(cd) / d / 1e9, 4),
                     "out_bytes": len(cd)}
    # thread-parallel host decode of an independent indexed member
    try:
        from flate_tpu import pinflate
        ind = dev_compress(data, level=LEVEL, independent=True) \
            if PIPE == "v2" else None
        if ind is not None:
            pinflate.decompress_indexed(ind)      # warm
            t0 = time.time()
            out = pinflate.decompress_indexed(ind)
            d = time.time() - t0
            assert out == data
            dec["host_parallel_indexed"] = {
                "gbps": round(len(data) / d / 1e9, 4),
                "threads": os.cpu_count(),
                "indexed_bytes": len(ind)}
    except Exception as e:
        detail["host_parallel_error"] = f"{type(e).__name__}: {e}"[:200]

    # device inflate of our own FLT1-indexed member (shard-parallel decode)
    if os.environ.get("BENCH_DEV_INFLATE", "1") != "0":
        try:
            from flate_tpu.jx import inflate2
            inflate2.decompress_device(blob)  # warm/compile
            t0 = time.time()
            out = inflate2.decompress_device(blob)
            d = time.time() - t0
            assert out == data
            dec["device_indexed"] = {
                "gbps": round(len(data) / d / 1e9, 4),
                "out_bytes": len(data)}
            dec_mode = "device+host"
        except Exception as e:
            detail["device_inflate_error"] = \
                f"{type(e).__name__}: {e}"[:200]
    detail["inflate"] = dec
    detail["inflate_mode"] = dec_mode
    detail["decode_gbps_host"] = dec["srctar"]["gbps"]
    detail["inflate_vs_baseline"] = round(
        dec["srctar"]["gbps"] / BASELINE_DEC_GBPS, 3)

    # ---- optional per-stage device profile (BENCH_PROFILE=1) ----
    if os.environ.get("BENCH_PROFILE") == "1" and PIPE == "v2":
        import numpy as _np
        import jax as _jax
        import jax.numpy as _jnp
        from flate_tpu import consts as _c
        from flate_tpu.jx import pipeline2 as _pp

        S, ctx, batch = _c.SHARD_LEN, _pp.CTX, 32
        K, nw, lz, mx, K3, sqz, blk = _pp.LEVEL_KERNEL[LEVEL]
        arr = _np.frombuffer(data[: batch * S], _np.uint8)
        sh_np = _np.zeros((batch, S), _np.uint8)
        sh_np.reshape(-1)[: arr.size] = arr
        sh = _jnp.asarray(sh_np)
        c0 = _jnp.asarray(_np.zeros(ctx, _np.uint8))
        cl = _jnp.asarray(_np.full(batch, ctx, _np.int32))
        vl = _jnp.asarray(_np.full(batch, S, _np.int32))
        fnl = _jnp.asarray(_np.zeros(batch, _np.int32))

        def sync_ms(f, n=10):
            r = f()
            _np.asarray(_jax.tree_util.tree_leaves(r)[0])[..., :1]
            t0 = time.perf_counter()
            for _ in range(n):
                r = f()
            _np.asarray(_jax.tree_util.tree_leaves(r)[0])[..., :1]
            return round((time.perf_counter() - t0) / n * 1e3, 1)

        win = _pp._prime_windows(sh, c0, ctx=ctx)
        ml, md = _pp.match2.find_matches_fused(win, cl, vl, K=K, nw=nw,
                                               ctx=ctx, K3=K3)
        prof = {
            "batch_mb": batch * S / 1e6,
            "match_ms": sync_ms(lambda: _pp.match2.find_matches_fused(
                win, cl, vl, K=K, nw=nw, ctx=ctx, K3=K3)),
            "parse_ms": sync_ms(lambda: _pp._parse_stage(
                ml, md, lazy=lz, max_lazy=mx, ctx=ctx, blk=blk)),
            "e2e_ms": sync_ms(lambda: _pp.encode_batch_staged(
                sh, c0, cl, vl, fnl, S=S, ctx=ctx, K=K, nw=nw, lazy=lz,
                max_lazy=mx, K3=K3, squeeze=sqz, blk=blk)),
        }
        prof["device_gbps"] = round(
            batch * S / prof["e2e_ms"] / 1e6, 4)
        detail["stage_profile"] = prof

    print(json.dumps({
        "metric": "gzip_level6_encode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "detail": detail,
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
