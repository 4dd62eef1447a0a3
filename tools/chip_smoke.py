"""Chip smoke test — every Pallas kernel at tiny shapes on the REAL backend.

Round-3 lesson (VERDICT r3, Missing #2): interpret-mode-green can mask
chip-fatal Mosaic lowering bugs, and the bench was the only chip
exerciser, so regressions were invisible until the final record.  This
script runs each Pallas kernel family and each production decode/encode
entry point at small shapes on whatever backend `jax.devices()` gives
(the axon TPU when the tunnel is up), checking results against the host
oracle.  Mosaic failures are FATAL (SIGABRT), so the orchestrator runs
the steps in a child process and respawns after a crash, recording
which step died.

Usage:
    python tools/chip_smoke.py            # orchestrate all steps
    python tools/chip_smoke.py --step N   # run steps N.. in-process
    python tools/chip_smoke.py --json     # print one JSON summary line

Exit 0 iff every step passed.
"""

import json
import os
import subprocess
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = []


def step(fn):
    STEPS.append(fn)
    return fn


# ---------------------------------------------------------------------------
# Steps: each returns None (pass) or raises.  Tiny shapes, real backend.
# ---------------------------------------------------------------------------

def _np():
    import numpy as np
    return np


@step
def backend():
    import jax
    d = jax.devices()
    assert d, "no devices"
    print(f"  backend={d[0].platform} device={d[0]}", flush=True)


@step
def runs_small():
    import numpy as np
    from flate_tpu.jx import runs
    rng = np.random.default_rng(0)
    B, W = 2, runs.TILE
    w = rng.integers(0, 4, (B, W), dtype=np.uint8)
    limit = np.full(B, W, np.int32)
    min_src = np.zeros(B, np.int32)
    got_l, got_d = runs.small_dist_runs(w, limit, min_src)
    ref_l, ref_d = runs.small_dist_runs(w, limit, min_src, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


@step
def runs_extend():
    import numpy as np
    from flate_tpu.jx import runs
    rng = np.random.default_rng(1)
    B, W = 2, runs.TILE
    ml = rng.integers(0, 33, (B, W)).astype(np.int32)
    md = rng.integers(1, 64, (B, W)).astype(np.int32)
    limit = np.full(B, W, np.int32)
    got = runs.extend_chains(ml, md, limit, cap=32)
    ref = runs.extend_chains(ml, md, limit, cap=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@step
def runs_extend2():
    import numpy as np
    from flate_tpu.jx import runs
    rng = np.random.default_rng(2)
    B, W = 2, runs.TILE
    l1 = rng.integers(0, 9, (B, W)).astype(np.int32)
    d1 = rng.integers(1, 64, (B, W)).astype(np.int32)
    l2 = rng.integers(0, 9, (B, W)).astype(np.int32)
    d2 = rng.integers(1, 64, (B, W)).astype(np.int32)
    limit = np.full(B, W, np.int32)
    g = runs.extend_chains2(l1, d1, l2, d2, limit, cap=8)
    r = runs.extend_chains2(l1, d1, l2, d2, limit, cap=8, interpret=True)
    for a, b in zip(g, r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@step
def match_fused():
    import numpy as np
    from flate_tpu.jx import match2
    data = (b"the quick brown fox jumps over the lazy dog " * 400)[:16384]
    B = 2
    w = np.frombuffer(data, np.uint8)[None].repeat(B, 0)
    cl = np.full(B, 1024, np.int32)
    vl = np.full(B, w.shape[1] - 1024, np.int32)
    got = match2.find_matches_fused(w, cl, vl, K=8, nw=2, ctx=1024)
    ref = match2.find_matches_fused(w, cl, vl, K=8, nw=2, ctx=1024,
                                    interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@step
def parse_pallas():
    import numpy as np
    from flate_tpu.jx import parse
    rng = np.random.default_rng(3)
    B, W = 2, 4096
    ml = np.where(rng.random((B, W)) < 0.2,
                  rng.integers(3, 20, (B, W)), 0).astype(np.int32)
    md = np.where(ml > 0, rng.integers(1, 100, (B, W)), 0).astype(np.int32)
    got = parse.parse_walk(ml, md, start=0, lazy=True, max_lazy=32)
    ref = parse.parse_walk(ml, md, start=0, lazy=True, max_lazy=32,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@step
def pack_pallas():
    import numpy as np
    from flate_tpu.jx import pack
    rng = np.random.default_rng(4)
    B, N = 2, 2048
    bits = rng.integers(0, 16, (B, N)).astype(np.int32)
    vals = (rng.integers(0, 1 << 16, (B, N)).astype(np.uint32)
            & ((1 << bits.astype(np.uint32)) - 1))
    got = pack.pack_fields(vals, bits, 8)
    ref = pack.pack_fields(vals, bits, 8, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@step
def checksum_dev():
    import numpy as np
    from flate_tpu.jx import checksum
    rng = np.random.default_rng(5)
    rows = rng.integers(0, 256, (3, 4096), dtype=np.uint8)
    lens = np.array([4096, 100, 0], np.int64)
    for i, ln in enumerate(lens):        # contract: zero-padded rows
        rows[i, ln:] = 0
    got = checksum.crc32_shards(rows, lens)
    for i in range(3):
        assert int(got[i]) == zlib.crc32(rows[i, :lens[i]].tobytes()), i


@step
def encode_e2e():
    import gzip as pygz
    from flate_tpu.jx import pipeline2
    data = (b"chip smoke corpus: " * 3000)[:28672]
    blob = pipeline2.compress_device2(data, level=6, shard_len=7168,
                                      ctx=1024, batch=4)
    assert pygz.decompress(blob) == data


@step
def inflate_indexed():
    from flate_tpu.jx import inflate2, pipeline2
    data = (b"indexed decode smoke " * 2000)[:28672]
    blob = pipeline2.compress_device2(data, level=6, shard_len=7168,
                                      ctx=1024, batch=4)
    out = inflate2.decompress_device(blob, batch=4)
    assert out == data


@step
def inflate_any():
    import struct
    from flate_tpu.jx import anyinflate
    data = (b"arbitrary-stream decode smoke " * 1500)[:32768]
    gz = (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
          + zlib.compress(data, 6)[2:-4]
          + struct.pack("<II", zlib.crc32(data), len(data) & 0xFFFFFFFF))
    out = anyinflate.decompress_device_any(gz)
    assert out == data


# ---------------------------------------------------------------------------
# Runner / orchestrator
# ---------------------------------------------------------------------------

def run_from(idx: int) -> int:
    """Run steps idx.. in-process; print PASS/FAIL markers.  Returns the
    index of the first non-crash failure + 100, or 0 if all passed.
    A Mosaic crash aborts the process mid-step; the parent knows the
    step from the last BEGIN marker."""
    rc = 0
    for i in range(idx, len(STEPS)):
        fn = STEPS[i]
        print(f"BEGIN {i} {fn.__name__}", flush=True)
        t0 = time.time()
        try:
            fn()
            print(f"PASS {i} {fn.__name__} {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"FAIL {i} {fn.__name__} {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            rc = 1
    return rc


def orchestrate() -> dict:
    results = {}
    idx = 0
    while idx < len(STEPS):
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--step", str(idx)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        last_begin = None
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\nTIMEOUT"
        for ln in out.splitlines():
            if ln.startswith("BEGIN "):
                last_begin = int(ln.split()[1])
            elif ln.startswith("PASS "):
                results[ln.split()[2]] = {"ok": True,
                                          "secs": float(ln.split()[3][:-1])}
            elif ln.startswith("FAIL "):
                parts = ln.split(None, 3)
                results[parts[2]] = {"ok": False, "err": parts[3][:300]}
            elif ln.strip() and not ln.startswith(("  ", "WARNING", "I0",
                                                   "E0", "W0", "F0")):
                pass
        if p.returncode == 0 or (p.returncode == 1 and "TIMEOUT" not in out):
            break  # child enumerated everything (failures are soft)
        # child crashed (Mosaic SIGABRT / timeout) at step last_begin
        crashed = last_begin if last_begin is not None else idx
        name = STEPS[crashed].__name__
        tail = "\n".join(out.splitlines()[-12:])
        results[name] = {"ok": False, "crash": True, "tail": tail[-600:]}
        print(f"CRASH {crashed} {name} (rc={p.returncode})", flush=True)
        idx = crashed + 1
    return results


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--step":
        sys.exit(run_from(int(sys.argv[2])))
    res = orchestrate()
    ok = all(v.get("ok") for v in res.values()) and len(res) == len(STEPS)
    summary = {"ok": bool(ok),
               "passed": sum(1 for v in res.values() if v.get("ok")),
               "total": len(STEPS), "results": res}
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
