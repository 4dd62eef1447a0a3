"""Chip A/B for round-5 device-time levers.

Measures, on the real TPU, per-stage and e2e device time of the level-6
encode at batch 64 for: base (48,8) / nw4 (48,4) / grid_only squeeze /
nw4+grid_only, plus the pure device-time indexed-decode probe and
lax.sort scaling.  Prints incrementally; every section guarded.

Run: python tools/chip_ab.py            (needs the axon tunnel up)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp
from flate_tpu.jx import squeeze as sq


def _sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.reshape(-1)[:1])


def sync_ms(f, n=10):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return round((time.perf_counter() - t0) / n * 1e3, 1)


def corpus(nbytes: int) -> bytes:
    import glob
    parts = []
    for f in sorted(glob.glob("/root/repo/flate_tpu/**/*.py",
                              recursive=True)):
        parts.append(open(f, "rb").read())
    seed = b"".join(parts) or b"x" * 1000
    return (seed * (nbytes // len(seed) + 1))[:nbytes]


def profile_encode(level_cfg, grid_only, batch=64, label=""):
    K, nw, lz, mx, K3, sqz, blk = level_cfg
    S, ctx = consts.SHARD_LEN, pp.CTX
    data = corpus(batch * S)
    arr = np.frombuffer(data, np.uint8)
    sh = jnp.asarray(arr.reshape(batch, S))
    c0 = jnp.zeros(ctx, jnp.uint8)
    cl = jnp.asarray(np.full(batch, ctx, np.int32))
    vl = jnp.asarray(np.full(batch, S, np.int32))
    fnl = jnp.zeros(batch, jnp.int32)

    win = pp._prime_windows(sh, c0, ctx=ctx)
    t0 = time.time()
    ml, md = pp.match2.find_matches_fused(win, cl, vl, K=K, nw=nw,
                                          ctx=ctx, K3=K3)
    _sync((ml, md))
    compile_s = time.time() - t0
    tk, st, ml2, md2 = pp._parse_stage(ml, md, lazy=lz, max_lazy=mx,
                                       ctx=ctx, blk=blk)
    m_r, d_r = ml2[:, ctx:], md2[:, ctx:]
    tk_r, st_r = tk[:, ctx:], st[:, ctx:]
    wt = win[:, ctx:]
    seg = pp.encode2.seg_size(S, blk)
    prof = {"label": label, "compile_match_s": round(compile_s, 1)}
    prof["match_ms"] = sync_ms(lambda: pp.match2.find_matches_fused(
        win, cl, vl, K=K, nw=nw, ctx=ctx, K3=K3))
    prof["parse_ms"] = sync_ms(lambda: pp._parse_stage(
        ml, md, lazy=lz, max_lazy=mx, ctx=ctx, blk=blk))
    if sqz:
        prof["squeeze_ms"] = sync_ms(lambda: pp._squeeze_stage(
            wt, m_r, d_r, tk_r, st_r, vl, blk=blk, grid_only=grid_only))
    vals, bits, _tb, _kd = pp.encode2.build_fields(
        wt, m_r, d_r, st_r, tk_r, vl, fnl, S, seg)
    prof["build_ms"] = sync_ms(lambda: pp.encode2.build_fields(
        wt, m_r, d_r, st_r, tk_r, vl, fnl, S, seg))
    prof["pack_ms"] = sync_ms(lambda: pp.pk.pack_fields(
        vals, bits, pp._nwr(S, seg)))
    prof["e2e_ms"] = sync_ms(lambda: pp.encode_batch_staged(
        sh, c0, cl, vl, fnl, S=S, ctx=ctx, K=K, nw=nw, lazy=lz,
        max_lazy=mx, K3=K3, squeeze=sqz, blk=blk))
    prof["device_gbps"] = round(batch * S / prof["e2e_ms"] / 1e6, 4)
    print(prof, flush=True)
    return prof


def profile_matcher_pieces(batch=64, K=48, nw=8, interpret=False):
    """Sub-stage breakdown of _candidate_pass: prep / carried sort /
    matcher kernel / unsort / small-dist runs / chain extension."""
    from flate_tpu.jx import match2, runs
    S, ctx = consts.SHARD_LEN, pp.CTX
    data = corpus(batch * S)
    sh = jnp.asarray(np.frombuffer(data, np.uint8).reshape(batch, S))
    win = pp._prime_windows(sh, jnp.zeros(ctx, jnp.uint8), ctx=ctx)
    B, W = win.shape
    cl = jnp.asarray(np.full(batch, ctx, np.int32))
    vl = jnp.asarray(np.full(batch, S, np.int32))
    ne, nf = match2._split_words(nw, False)
    key, words_t = match2._prep(win, ne, nf, 4, interpret=interpret)
    nc = ne + nf
    T = -(-W // match2.TILE)
    Wp = T * match2.TILE
    words_flat = [words_t[:, :, t].reshape(B, Wp) for t in range(nc)]
    sortf = jax.jit(lambda k, *o: jax.lax.sort([k, *o], dimension=1,
                                               num_keys=1))
    sorted_ops = sortf(key, *words_flat)
    skey = sorted_ops[0]
    spos = (skey & match2.POS_MASK).astype(jnp.int32)
    skey_t = skey.reshape(B, T, match2.SUB, match2.LANES)
    swords_t = tuple(o.reshape(B, T, match2.SUB, match2.LANES)
                     for o in sorted_ops[1:])
    meta = jnp.stack([
        (ctx - cl).astype(jnp.int32), (ctx + vl).astype(jnp.int32),
        jnp.full((B,), consts.MAX_DISTANCE, jnp.int32),
        jnp.zeros((B,), jnp.int32)], axis=1)
    best = match2._run_matcher(skey_t, swords_t, meta, K, ne, nf,
                               interpret=interpret)
    unsortf = jax.jit(lambda p, b: jax.lax.sort([p, b], dimension=1,
                                                num_keys=1))
    limit = (ctx + vl).astype(jnp.int32)
    min_src = (ctx - cl).astype(jnp.int32)
    mlen = (best[:, :W] >> 16).astype(jnp.int32)
    mdist = (best[:, :W] & 0xFFFF).astype(jnp.int32)
    prof = {
        "prep_ms": sync_ms(lambda: match2._prep(win, ne, nf, 4,
                                                interpret=interpret)),
        "sort_ms": sync_ms(lambda: sortf(key, *words_flat)),
        "matcher_ms": sync_ms(lambda: match2._run_matcher(
            skey_t, swords_t, meta, K, ne, nf, interpret=interpret)),
        "unsort_ms": sync_ms(lambda: unsortf(
            spos.astype(jnp.uint32), best)),
        "runs_ms": sync_ms(lambda: runs.small_dist_runs(
            win, limit, min_src, interpret=interpret)),
        "extend_ms": sync_ms(lambda: runs.extend_chains(
            mlen, mdist, limit, cap=4 * ne, interpret=interpret)),
    }
    print("matcher pieces:", prof, flush=True)
    return prof


def main():
    print("devices:", jax.devices(), flush=True)
    try:
        profile_matcher_pieces()
    except Exception as e:
        print("pieces failed:", type(e).__name__, str(e)[:200], flush=True)
    base = (48, 8, True, 32, 0, True, 1024)
    # nw/fp payload reductions were size-REJECTED (tools/size_ablation
    # r5: nw4 text 1.0083, fp4 1.0041) — only grid_only is in play
    for cfg, go, label in ((base, False, "base_48_8"),
                           (base, True, "gridonly")):
        try:
            profile_encode(cfg, go, label=label)
        except Exception as e:
            print(label, "failed:", type(e).__name__, str(e)[:200],
                  flush=True)

    # device-time indexed decode probe (32 coded shards)
    try:
        from flate_tpu.jx import inflate2
        data = corpus(8 * 1024 * 1024)
        blob = pp.compress_device2(data, level=6, independent=True)
        import bench as _b  # repo-root bench for the probe helper
        r = _b._devicetime_decode(blob)
        print("decode devicetime:", r, flush=True)
    except Exception as e:
        print("decode probe failed:", type(e).__name__, str(e)[:200],
              flush=True)


if __name__ == "__main__":
    main()
