"""Benchmark harness — encode/decode suite with baseline comparison.

Prints the record JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}
INCREMENTALLY: after every section the full record (with everything
measured so far) is re-printed and flushed, so a mid-run kill still
leaves a parseable official record on stdout (the last JSON line) and
in BENCH_PARTIAL.json.  The final line is the complete record.

Headline: level-6 gzip encode GB/s/chip through the v2 device pipeline
(reference: 1824.6 ms for 177,257,685 B on one Apple M1 core ≈ 0.0971
GB/s — BASELINE.md).  Detail carries the per-level encode ladder, the
four-corpus inflate bench (bin/inflate_bench.zig parity), device
decode throughput, compressed sizes vs zlib, compile (cold+warm) and
transfer accounting.  Corpora are deterministic in-repo stand-ins
(zero egress; the originals are network-fetched).

Budget model (round-4 verdict Missing #1: the all-or-nothing harness
timed out and recorded NOTHING): a global deadline (BENCH_DEADLINE_S,
default 2100 s) is divided among sections in priority order —
headline, device_inflate, inflate, ladder — each in its own
subprocess with timeout = min(section budget, time left).  Sections
self-limit against BENCH_SECTION_BUDGET and emit what they finished.
No blanket retries (one fast retry only for a backend-init failure).
Timed sections use hyperfine semantics: 1 warmup + 3 runs, best +
stddev (reference bench.rb:5-15, one hyperfine per metric :21-67).

Env knobs: BENCH_CORPUS_MB (default 32; 176 reproduces reference
scale), BENCH_DEADLINE_S (2100), BENCH_LEVEL (6), BENCH_LADDER=
none|small|full (small: 1/6/9), BENCH_PIPE=v2|v1, BENCH_RUNS (3),
BENCH_PROFILE=0 to skip per-stage timings.
"""

import json
import os
import statistics
import subprocess
import sys
import time
import zlib

BASELINE_GBPS = 177_257_685 / 1.8246 / 1e9  # reference level-6, readme.md:25
BASELINE_DEC_GBPS = 177_244_160 / 0.36436 / 1e9  # readme.md:47

CORPUS_MB = int(os.environ.get("BENCH_CORPUS_MB", "32"))
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "2100"))
LEVEL = int(os.environ.get("BENCH_LEVEL", "6"))
LADDER = os.environ.get("BENCH_LADDER", "small")
PIPE = os.environ.get("BENCH_PIPE", "v2")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))

_START = time.time()

# priority order + soft per-section budgets (seconds); a section never
# gets more than the time left under the global deadline
PRIORITY = ("headline", "compile_warm", "device_inflate", "inflate",
            "ladder")
SOFT_BUDGET = {"headline": 900, "compile_warm": 300,
               "device_inflate": 600, "inflate": 420, "ladder": 700}
MIN_REQUIRED = {"headline": 300, "compile_warm": 60,
                "device_inflate": 150, "inflate": 90, "ladder": 120}


def _left() -> float:
    return DEADLINE_S - (time.time() - _START)


def _section_budget() -> float:
    """Time this SECTION subprocess may still use (set by orchestrator)."""
    dl = float(os.environ.get("BENCH_SECTION_BUDGET", "1e9"))
    return dl - (time.time() - _START)


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


def timed_best(fn, runs: int = RUNS, warmup: int = 1):
    """hyperfine semantics: warmup, then `runs` timed calls.
    Returns (result, best_seconds, stddev_seconds, warmup_seconds)."""
    t0 = time.time()
    for _ in range(warmup):
        r = fn()
    warm_s = time.time() - t0
    times = []
    for _ in range(runs):
        t0 = time.time()
        r = fn()
        times.append(time.time() - t0)
    sd = statistics.stdev(times) if len(times) > 1 else 0.0
    return r, min(times), sd, warm_s


def _dev_compress():
    if PIPE == "v2":
        from flate_tpu.jx.pipeline2 import compress_device2 as dc
    else:
        from flate_tpu.jx.pipeline import compress_device as dc
    return dc


# ---------------------------------------------------------------------------
# Sections (each runs in its own subprocess; prints one JSON line)
# ---------------------------------------------------------------------------

def sec_headline() -> dict:
    import gzip as pygz
    dev_compress = _dev_compress()
    data = build_corpus(CORPUS_MB * 1024 * 1024)

    t0 = time.time()
    dev_compress(data[: 8 * 1024 * 1024], level=LEVEL)  # compile
    compile_s = time.time() - t0
    blob, best_s, sd, _ = timed_best(lambda: dev_compress(data, level=LEVEL))
    gbps = len(data) / best_s / 1e9
    ok = pygz.decompress(blob) == data
    zl = zlib.compress(data, LEVEL)
    # tunnel accounting: on an axon-tunneled chip, host<->device moves
    # ~40 MB/s, which caps E2E wall-clock regardless of device speed —
    # record the measured transfer rate so the e2e/device gap is data
    tunnel = {}
    try:
        import jax as _jax
        import numpy as _np
        probe = _np.zeros(16 * 1024 * 1024, _np.uint8)
        d = _jax.device_put(probe)
        _np.asarray(d[:1])
        t0 = time.time()
        d = _jax.device_put(probe)
        _np.asarray(d[:1])
        tunnel["h2d_gbps"] = round(len(probe) / (time.time() - t0) / 1e9, 4)
        t0 = time.time()
        _np.asarray(d)
        tunnel["d2h_gbps"] = round(len(probe) / (time.time() - t0) / 1e9, 4)
    except Exception as e:  # pragma: no cover
        tunnel["error"] = f"{type(e).__name__}: {e}"[:120]
    out = {
        "gbps": round(gbps, 4),
        "transfer": tunnel,
        "corpus_bytes": len(data),
        "compressed_bytes": len(blob),
        "ratio": round(len(blob) / len(data), 4),
        "zlib_bytes": len(zl),
        "size_vs_zlib": round(len(blob) / len(zl), 4),
        "roundtrip_ok": bool(ok),
        "encode_seconds_best": round(best_s, 3),
        "encode_seconds_stddev": round(sd, 4),
        "runs": RUNS,
        "compile_seconds_cold": round(compile_s, 1),
        "level": LEVEL,
        "pipeline": PIPE,
    }
    print(json.dumps(out), flush=True)     # snapshot before the profile
    if os.environ.get("BENCH_PROFILE", "1") != "0" and PIPE == "v2" \
            and _section_budget() > 60:
        # default ON: the official record must carry per-stage numbers
        try:
            out["stage_profile"] = _stage_profile(data)
        except Exception as e:  # pragma: no cover
            out["stage_profile_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def sec_compile_warm() -> dict:
    """Warm-cache compile probe: fresh process, persistent cache already
    populated by the headline section (VERDICT r4 #7: record cold AND
    warm compile seconds; warm target <30 s)."""
    dev_compress = _dev_compress()
    data = build_corpus(8 * 1024 * 1024)
    t0 = time.time()
    dev_compress(data, level=LEVEL)
    return {"compile_seconds_warm": round(time.time() - t0, 1)}


def sec_ladder() -> dict:
    import gzip as pygz
    dev_compress = _dev_compress()
    data = build_corpus(min(CORPUS_MB, 16) * 1024 * 1024)
    levels = range(1, 10) if LADDER == "full" else (1, 6, 9)
    lad = {}
    for lv in levels:
        if _section_budget() < 120:
            lad[str(lv)] = {"skipped": "deadline"}
            continue
        try:
            blob, best_s, sd, _ = timed_best(
                lambda lv=lv: dev_compress(data, level=lv))
            lad[str(lv)] = {
                "gbps": round(len(data) / best_s / 1e9, 4),
                "stddev_s": round(sd, 4),
                "bytes": len(blob),
                "vs_zlib": round(
                    len(blob) / len(zlib.compress(data, lv)), 4),
                "ok": pygz.decompress(blob) == data,
            }
        except Exception as e:  # pragma: no cover
            lad[str(lv)] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({"ladder": lad, "ladder_bytes": len(data)}),
              flush=True)                  # per-level snapshot
    # size-vs-zlib on NON-self-referential corpora (text + mixed) so the
    # "beats zlib" claim is not limited to the repo-source corpus
    sizes = {}
    for name, cd in (("text", text_corpus(3_359_630)),
                     ("mixed", mixed_corpus(8 * 1024 * 1024))):
        row = {}
        for lv in (1, 6, 9):
            if _section_budget() < 45:
                row[str(lv)] = "skipped: deadline"
                continue
            try:
                blob = dev_compress(cd, level=lv)
                assert pygz.decompress(blob) == cd
                row[str(lv)] = round(
                    len(blob) / len(zlib.compress(cd, lv)), 4)
            except Exception as e:  # pragma: no cover
                row[str(lv)] = f"{type(e).__name__}"[:60]
        sizes[name] = row
    return {"ladder": lad, "ladder_bytes": len(data),
            "size_vs_zlib_corpora": sizes}


def sec_inflate() -> dict:
    import struct
    import flate_tpu as ft
    data = build_corpus(min(CORPUS_MB, 32) * 1024 * 1024)
    dec = {}
    corpora = {
        "srctar": data,
        "text": text_corpus(3_359_630),
        "large": mixed_corpus(11_162_624),
        "cantrbry": mixed_corpus(2_821_120),
    }
    for name, cd in corpora.items():
        gz = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + \
            zlib.compress(cd, 6)[2:-4] + \
            struct.pack("<II", zlib.crc32(cd), len(cd) & 0xFFFFFFFF)
        out, best_s, sd, _ = timed_best(lambda gz=gz: ft.gzip.decompress(gz))
        assert out == cd
        dec[name] = {"gbps": round(len(cd) / best_s / 1e9, 4),
                     "stddev_s": round(sd, 4), "out_bytes": len(cd)}
    res = {"inflate": dec, "decode_gbps_host": dec["srctar"]["gbps"],
           "inflate_vs_baseline": round(
               dec["srctar"]["gbps"] / BASELINE_DEC_GBPS, 3)}
    print(json.dumps(res), flush=True)     # host numbers are safe now
    # thread-parallel host decode of an independent indexed member
    try:
        if PIPE == "v2" and _section_budget() > 180:
            from flate_tpu import pinflate
            dev_compress = _dev_compress()
            ind = dev_compress(data, level=LEVEL, independent=True)
            out, best_s, sd, _ = timed_best(
                lambda: pinflate.decompress_indexed(ind))
            assert out == data
            dec["host_parallel_indexed"] = {
                "gbps": round(len(data) / best_s / 1e9, 4),
                "stddev_s": round(sd, 4),
                "threads": os.cpu_count(),
                "indexed_bytes": len(ind)}
    except Exception as e:
        res["host_parallel_error"] = f"{type(e).__name__}: {e}"[:200]
    return res


def _devicetime_decode(blob: bytes, nshards: int = 8) -> dict:
    """Pure device-side decode GB/s: one packed coded run timed with a
    one-element sync, so the ~40 MB/s tunnel does not pollute the
    design metric (STATUS r4: 'device-side GB/s is the number that
    reflects the design; record both')."""
    import jax as _jax
    import numpy as _np
    from flate_tpu.containers import Container, parse_header
    from flate_tpu.jx import inflate2
    hdr_len, meta = parse_header(Container.GZIP, blob)
    comp_lens, out_lens, _fl = inflate2.parse_index_extra(meta.extra)
    starts = hdr_len + _np.concatenate([[0], _np.cumsum(comp_lens)[:-1]])
    plans = []
    for j in range(len(comp_lens)):
        if len(plans) >= nshards:
            break
        sh = blob[starts[j]:starts[j] + int(comp_lens[j])]
        p = inflate2.plan_shard(sh, int(out_lens[j]))
        if p.kind == "coded":
            plans.append((p, sh))
    S = max(-(-int(out_lens.max()) // 1024) * 1024, 1024)
    args = inflate2.pack_coded_run(plans, b"")

    def once():
        return inflate2.decode_batch2(*args, S=S, NS=S + 128)

    def sync(r):
        for leaf in _jax.tree_util.tree_leaves(r):
            _np.asarray(leaf.reshape(-1)[:1])

    sync(once())
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        r = once()
    sync(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    nbytes = sum(p.out_len for p, _ in plans)
    return {"device_ms_per_batch": round(ms, 2),
            "batch_shards": len(plans), "batch_bytes": nbytes,
            "gbps_device": round(nbytes / ms / 1e6, 4)}


def sec_device_inflate() -> dict:
    # 16 MiB: the device decode paths are measured per-byte, and the
    # section must FIT the budget — r3 crashed here, r4 never reached
    # it; an official number at 16 MiB beats no number at 176 MiB
    data = build_corpus(min(CORPUS_MB, 16) * 1024 * 1024)
    dev_compress = _dev_compress()
    from flate_tpu.jx import inflate2
    res = {}
    # our own FLT1-indexed member (shard-parallel decode)
    blob = dev_compress(data, level=LEVEL)
    out, best_s, sd, _ = timed_best(lambda: inflate2.decompress_device(blob))
    assert out == data
    res["device_indexed"] = {
        "gbps": round(len(data) / best_s / 1e9, 4),
        "stddev_s": round(sd, 4), "out_bytes": len(data)}
    print(json.dumps(res), flush=True)     # snapshot
    try:
        ind = dev_compress(data, level=LEVEL, independent=True)
        res["device_indexed"]["devicetime"] = _devicetime_decode(ind)
    except Exception as e:
        res["device_indexed"]["devicetime_error"] = \
            f"{type(e).__name__}: {e}"[:200]
    # arbitrary unindexed gzip (zlib-produced — the north-star shape)
    try:
        if _section_budget() < 120:
            raise TimeoutError("section budget exhausted")
        import struct
        cd = data[: min(len(data), 8 * 1024 * 1024)]
        gz = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03" + \
            zlib.compress(cd, 6)[2:-4] + \
            struct.pack("<II", zlib.crc32(cd), len(cd) & 0xFFFFFFFF)
        from flate_tpu.jx import anyinflate
        out, best_s, sd, _ = timed_best(
            lambda: anyinflate.decompress_device_any(gz))
        assert out == cd
        res["device_unindexed"] = {
            "gbps": round(len(cd) / best_s / 1e9, 4),
            "stddev_s": round(sd, 4), "out_bytes": len(cd)}
    except Exception as e:
        res["device_unindexed"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return res


def _stage_profile(data: bytes) -> dict:
    import numpy as _np
    import jax as _jax
    import jax.numpy as _jnp
    from flate_tpu import consts as _c
    from flate_tpu.jx import pipeline2 as _pp

    # batch matches compress_device2's default so every stage program is
    # already compiled by the headline encode (no extra compile cost)
    S, ctx, batch = _c.SHARD_LEN, _pp.CTX, 64
    K, nw, lz, mx, K3, sqz, blk = _pp.LEVEL_KERNEL[LEVEL]
    arr = _np.frombuffer(data[: batch * S], _np.uint8)
    sh_np = _np.zeros((batch, S), _np.uint8)
    sh_np.reshape(-1)[: arr.size] = arr
    sh = _jnp.asarray(sh_np)
    c0 = _jnp.asarray(_np.zeros(ctx, _np.uint8))
    cl = _jnp.asarray(_np.full(batch, ctx, _np.int32))
    vl = _jnp.asarray(_np.full(batch, S, _np.int32))
    fnl = _jnp.asarray(_np.zeros(batch, _np.int32))

    def _sync(r):
        # slice ON DEVICE first, then fetch one element per leaf —
        # np.asarray(leaf) would drag the full array through the
        # tunnel (~40 MB/s) and dominate every stage number
        for leaf in _jax.tree_util.tree_leaves(r):
            _np.asarray(leaf.reshape(-1)[:1])

    def sync_ms(f, n=10):
        _sync(f())
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        _sync(r)
        return round((time.perf_counter() - t0) / n * 1e3, 1)

    win = _pp._prime_windows(sh, c0, ctx=ctx)
    ml, md = _pp.match2.find_matches_fused(win, cl, vl, K=K, nw=nw,
                                           ctx=ctx, K3=K3)
    tk, st, ml2, md2 = _pp._parse_stage(ml, md, lazy=lz, max_lazy=mx,
                                        ctx=ctx, blk=blk)
    m_r, d_r = ml2[:, ctx:], md2[:, ctx:]
    tk_r, st_r = tk[:, ctx:], st[:, ctx:]
    wt = win[:, ctx:]
    seg = _pp.encode2.seg_size(S, blk)
    vals, bits, _tb, _kd = _pp.encode2.build_fields(
        wt, m_r, d_r, st_r, tk_r, vl, fnl, S, seg)
    prof = {
        "batch_mb": batch * S / 1e6,
        "match_ms": sync_ms(lambda: _pp.match2.find_matches_fused(
            win, cl, vl, K=K, nw=nw, ctx=ctx, K3=K3)),
        "parse_ms": sync_ms(lambda: _pp._parse_stage(
            ml, md, lazy=lz, max_lazy=mx, ctx=ctx, blk=blk)),
        "build_ms": sync_ms(lambda: _pp.encode2.build_fields(
            wt, m_r, d_r, st_r, tk_r, vl, fnl, S, seg)),
        "pack_ms": sync_ms(lambda: _pp.pk.pack_fields(
            vals, bits, _pp._nwr(S, seg))),
        "e2e_ms": sync_ms(lambda: _pp.encode_batch_staged(
            sh, c0, cl, vl, fnl, S=S, ctx=ctx, K=K, nw=nw, lazy=lz,
            max_lazy=mx, K3=K3, squeeze=sqz, blk=blk)),
    }
    if sqz:
        prof["squeeze_ms"] = sync_ms(lambda: _pp._squeeze_stage(
            wt, m_r, d_r, tk_r, st_r, vl, blk=blk))
    prof["device_gbps"] = round(batch * S / prof["e2e_ms"] / 1e6, 4)
    # jax.profiler trace of one e2e batch (SURVEY §5 tracing obligation)
    trace_dir = os.environ.get("BENCH_TRACE_DIR", "/tmp/flate_tpu_trace")
    try:
        with _jax.profiler.trace(trace_dir):
            r = _pp.encode_batch_staged(
                sh, c0, cl, vl, fnl, S=S, ctx=ctx, K=K, nw=nw, lazy=lz,
                max_lazy=mx, K3=K3, squeeze=sqz, blk=blk)
            _sync(r)
        prof["trace_dir"] = trace_dir
    except Exception as e:  # pragma: no cover
        prof["trace_error"] = f"{type(e).__name__}: {e}"[:120]
    return prof


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------

PARTIAL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_PARTIAL.json")


def emit(detail: dict, final: bool) -> dict:
    """(Re-)print the full record with everything measured so far."""
    gbps = detail.get("gbps", 0.0)
    rec = {
        "metric": "gzip_level6_encode_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s/chip",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
        "detail": detail,
    }
    if not final:
        rec["partial"] = True
    print(json.dumps(rec), flush=True)
    try:
        with open(PARTIAL_PATH, "w") as fh:
            json.dump(rec, fh)
    except OSError:
        pass
    return rec


def run_section(name: str, budget: float) -> dict:
    """Run one section in a subprocess (fresh backend, shared
    compilation cache).  One fast retry ONLY for a backend-init
    failure (transient tunnel outage — BENCH_r02 failure mode)."""
    env = dict(os.environ)
    env.setdefault("FLATE_TPU_CACHE", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    def _last_json(out) -> dict | None:
        if not out:
            return None
        txt = out.decode() if isinstance(out, bytes) else out
        lines = [ln for ln in txt.splitlines() if ln.startswith("{")]
        if not lines:
            return None
        try:
            return json.loads(lines[-1])
        except ValueError:
            return None

    for attempt in (1, 2):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--section", name],
                capture_output=True, timeout=max(30, budget), env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
            got = _last_json(p.stdout)
            if p.returncode == 0 and got is not None:
                return got
            err = (p.stderr.decode()[-400:] or
                   f"rc={p.returncode}, no JSON")
            if got is not None:    # crashed after a snapshot: keep it
                got[f"{name}_error"] = err[:300]
                return got
        except subprocess.TimeoutExpired as e:
            # salvage the section's last printed snapshot (sections
            # print intermediate JSON lines as sub-parts finish)
            got = _last_json(e.stdout)
            if got is not None:
                got[f"{name}_error"] = f"timeout after {budget:.0f}s"
                return got
            return {"error": f"timeout after {budget:.0f}s",
                    "section": name}
        except Exception as e:  # pragma: no cover
            err = f"{type(e).__name__}: {e}"
        fast_fail = time.time() - t0 < 90
        transient = "Unable to initialize backend" in err
        if attempt == 2 or not (fast_fail and transient) \
                or _left() < MIN_REQUIRED.get(name, 120):
            return {"error": err[:400], "section": name}
        time.sleep(5)
    return {"error": "unreachable"}


SECTION_FNS = {"headline": sec_headline, "compile_warm": sec_compile_warm,
               "ladder": sec_ladder, "inflate": sec_inflate,
               "device_inflate": sec_device_inflate}

_PROBE_SRC = ("import jax, numpy as np; "
              "d = jax.device_put(np.zeros(1 << 20, np.uint8)); "
              "np.asarray(d[:1]); print('OK')")


def tunnel_probe(timeout_s: float = 90) -> bool:
    """A 1 MiB device round-trip with a hard timeout: the axon tunnel
    sometimes wedges (transfers hang with devices still enumerable),
    which would otherwise burn every device section's full budget."""
    try:
        p = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, timeout=timeout_s)
        return b"OK" in p.stdout
    except Exception:
        return False


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        print(json.dumps(SECTION_FNS[sys.argv[2]]()))
        return

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    detail: dict = {
        "deadline_s": DEADLINE_S,
        "corpus_mb": CORPUS_MB,
        "cache_was_warm": bool(
            os.path.isdir(cache_dir) and os.listdir(cache_dir)),
    }
    plan = [n for n in PRIORITY
            if not (n == "ladder" and LADDER == "none")
            and not (n == "device_inflate"
                     and os.environ.get("BENCH_DEV_INFLATE", "1") == "0")]
    detail["tunnel_ok"] = tunnel_probe()
    if not detail["tunnel_ok"]:
        # host-only sections first; device sections still get a (short)
        # chance in case the tunnel heals mid-run
        plan.sort(key=lambda n: n != "inflate")
        for n in ("headline", "device_inflate"):
            SOFT_BUDGET[n] = 420
        SOFT_BUDGET["compile_warm"] = 120
    emit(detail, final=False)
    for name in plan:
        left = _left()
        if left < MIN_REQUIRED[name] + 30:
            detail[f"{name}_skipped"] = "deadline"
            emit(detail, final=False)
            continue
        budget = min(SOFT_BUDGET[name], left - 30)
        # the section subprocess shares the wall-clock origin via env so
        # its internal self-limits line up with the subprocess timeout
        os.environ["BENCH_SECTION_BUDGET"] = str(budget)
        detail.update(run_section(name, budget))
        emit(detail, final=False)

    rec = emit(detail, final=True)
    # exit 0 whenever the headline measured and roundtripped; section
    # errors are recorded in detail rather than voiding the record
    if "gbps" not in detail or not detail.get("roundtrip_ok", False):
        sys.exit(1)
    del rec


if __name__ == "__main__":
    main()
