"""Benchmark harness: level-6 gzip encode throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's level-6 encode of ziglang.tar on Apple M1 =
1824.6 ms for 177,257,685 bytes ≈ 0.0971 GB/s (BASELINE.md).  The bench
corpus is a deterministic source-tree tarball stand-in (the original
corpora are network-fetched and unavailable here): concatenated repo +
reference sources replicated to size, which compresses at a similar ratio
to ziglang.tar.
"""

import json
import os
import sys
import time

BASELINE_GBPS = 177_257_685 / 1.8246 / 1e9  # reference level-6, readme.md:25

CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "16"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "6"))


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


def main() -> None:
    import gzip as pygz

    from flate_tpu.jx.pipeline import compress_device

    data = build_corpus(CORPUS_MB * 1024 * 1024)

    # warm-up / compile
    t0 = time.time()
    blob = compress_device(data[: 4 * 1024 * 1024], level=LEVEL)
    compile_s = time.time() - t0

    t0 = time.time()
    blob = compress_device(data, level=LEVEL)
    dt = time.time() - t0
    gbps = len(data) / dt / 1e9

    ok = pygz.decompress(blob) == data
    ratio = len(blob) / len(data)

    # decode throughput (native host path; TPU inflate lands round 2)
    import flate_tpu as ft
    ft.gzip.decompress(blob)  # warm
    t0 = time.time()
    dec = ft.gzip.decompress(blob)
    dec_dt = time.time() - t0
    ok = ok and dec == data

    print(json.dumps({
        "metric": "gzip_level6_encode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "detail": {
            "corpus_bytes": len(data),
            "compressed_bytes": len(blob),
            "ratio": round(ratio, 4),
            "roundtrip_ok": bool(ok),
            "encode_seconds": round(dt, 3),
            "decode_gbps_host": round(len(data) / dec_dt / 1e9, 4),
            "compile_seconds": round(compile_s, 1),
            "level": LEVEL,
        },
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
