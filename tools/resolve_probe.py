"""Chip probe: where do the decode-resolve pointer-doubling rounds go?

Measures, on real data (bench text corpus, level-6 indexed member):
  - rounds to convergence of the full-array doubling loop
  - unresolved-entry count after every round (the compact-doubling
    opportunity: doubling restricted to the unresolved set is exact,
    because an unresolved entry's chain passes only through unresolved
    entries until its final hop)
  - time of the current _resolve vs a compacted variant

Usage: python tools/resolve_probe.py [nshards]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from flate_tpu.containers import Container, parse_header
from flate_tpu.jx import inflate2
from flate_tpu.jx.inflate2 import CTX, K_MATCH, K_LIT, K_EOB, K_BAD


def build_blob(nbytes: int) -> bytes:
    cache = f"/tmp/resolve_probe_{nbytes}.flt1"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            return fh.read()
    sys.path.insert(0, "/root/repo")
    import bench
    data = bench.text_corpus(nbytes)
    from flate_tpu.jx.pipeline2 import compress_device2
    t0 = time.time()
    blob = compress_device2(data, level=6, independent=True)
    print(f"compress {nbytes>>20} MiB: {time.time()-t0:.1f}s", flush=True)
    with open(cache, "wb") as fh:
        fh.write(blob)
    return blob


def pack(blob: bytes, nshards: int):
    hdr_len, meta = parse_header(Container.GZIP, blob)
    comp_lens, out_lens, _fl = inflate2.parse_index_extra(meta.extra)
    starts = hdr_len + np.concatenate([[0], np.cumsum(comp_lens)[:-1]])
    plans = []
    for j in range(len(comp_lens)):
        if len(plans) >= nshards:
            break
        sh = blob[starts[j]:starts[j] + int(comp_lens[j])]
        p = inflate2.plan_shard(sh, int(out_lens[j]))
        if p.kind == "coded":
            plans.append((p, sh))
    S = max(-(-int(out_lens.max()) // 1024) * 1024, 1024)
    return inflate2.pack_coded_run(plans, b""), S, plans


def words_counts(args, S, NS):
    (comp, clen, start, lims_ll, kbase_ll, syms_ll,
     lims_d, kbase_d, syms_d, out_lens, ctx0) = args

    @jax.jit
    def f(comp, clen, start, lims_ll, kbase_ll, syms_ll,
          lims_d, kbase_d, syms_d):
        word = inflate2._pass1(comp, lims_ll, kbase_ll, syms_ll,
                               lims_d, kbase_d, syms_d)
        mask, joined = inflate2._lane_walk(word, start, 8 * clen,
                                           G=inflate2.LANE_G)
        words, counts, spec_fail, _, _, _ = inflate2._extract(
            word, mask, joined, start, NS, inflate2.LANE_G)
        return words, counts

    return f(comp, clen, start, lims_ll, kbase_ll, syms_ll,
             lims_d, kbase_d, syms_d), out_lens, ctx0


def initial_pointers(words, counts, out_lens, ctx0, S):
    """Replicates _resolve up to (but excluding) the doubling loop."""
    B, NS = words.shape
    slots = jnp.arange(NS, dtype=jnp.int32)[None, :]
    live = slots < (counts[:, None] - 1)
    kind = ((words >> 6) & 3).astype(jnp.int32)
    value = ((words >> 8) & 0xFF).astype(jnp.int32)
    dist = ((words >> 16) & 0x7FFF).astype(jnp.int32) + 1
    is_m = live & (kind == K_MATCH)
    is_l = live & (kind == K_LIT)
    olen = jnp.where(is_m, value + 3, jnp.where(is_l, 1, 0))
    ends = jnp.cumsum(olen, axis=1)
    offs = ends - olen
    base = CTX + jnp.arange(B, dtype=jnp.int32)[:, None] * S
    T = CTX + B * S
    lit_pos = jnp.where(is_l, base + offs, T).reshape(-1)
    init = jnp.zeros(T + 1, jnp.int32).at[lit_pos].set(
        value.reshape(-1), mode="drop")
    init = init.at[:CTX].set(ctx0.astype(jnp.int32))
    pos_in = jnp.arange(S, dtype=jnp.int32)[None, :]
    marks = jnp.zeros((B, S + 1), jnp.int32).at[
        jnp.arange(B)[:, None], jnp.where(live, offs, S)].max(
        jnp.where(live, slots, 0), mode="drop")[:, :S]
    owner = jax.lax.cummax(marks, axis=1)
    o_off = jnp.take_along_axis(offs, owner, axis=1)
    o_dist = jnp.take_along_axis(dist, owner, axis=1)
    o_ism = jnp.take_along_axis(is_m.astype(jnp.int32), owner, axis=1)
    k_rel = pos_in - o_off
    src = base + o_off - o_dist + k_rel % o_dist
    glob = base + pos_in
    in_range = pos_in < out_lens[:, None]
    is_mb = (o_ism > 0) & in_range
    P = jnp.where(is_mb, src, glob)
    prev_m = jnp.pad(is_mb, ((0, 0), (1, 0)))[:, :S]
    prev_d = jnp.pad(o_dist, ((0, 0), (1, 0)))[:, :S]
    boundary = is_mb & (~prev_m | (prev_d != o_dist))
    a = jax.lax.cummax(jnp.where(boundary, pos_in, 0), axis=1)
    P_run = base + (a - o_dist) + (pos_in - a) % o_dist
    P = jnp.where(is_mb, P_run, P)
    P = jnp.clip(P, 0, T)
    Pf = jnp.concatenate([jnp.arange(CTX, dtype=jnp.int32),
                          P.reshape(-1),
                          jnp.asarray([T], jnp.int32)])
    return Pf, init, T


def main():
    nshards = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    nbytes = 4 * 1024 * 1024
    blob = build_blob(nbytes)
    args, S, plans = pack(blob, nshards)
    NS = S + 128
    (words, counts), out_lens, ctx0 = words_counts(args, S, NS)
    print(f"S={S} NS={NS} B={words.shape[0]} "
          f"T={CTX + words.shape[0]*S}", flush=True)

    @jax.jit
    def probe(words, counts, out_lens, ctx0):
        Pf, init, T = initial_pointers(words, counts, out_lens, ctx0, S)
        ROUNDS = 24
        stats = jnp.zeros(ROUNDS, jnp.int32)
        p = Pf
        for r in range(ROUNDS):
            p2 = jnp.take(p, p)
            stats = stats.at[r].set(jnp.sum(p2 != p))
            p = p2
        return stats

    stats = np.asarray(probe(words, counts, out_lens, ctx0))
    T = CTX + words.shape[0] * S
    print("unresolved after round r (of", T, "entries):")
    for r, s in enumerate(stats):
        print(f"  round {r+1:2d}: {int(s):9d}  ({100*int(s)/T:.3f}%)")
        if s == 0:
            break

    # A/B: full-round doubling with clamped vs promised-in-bounds gather
    Pf0, init0, Tn = jax.jit(
        lambda w, c, o, x: initial_pointers(w, c, o, x, S)[:2] + (0,))(
        words, counts, out_lens, ctx0)

    def loop(mode):
        @jax.jit
        def f(p):
            def cond(c):
                _, done, r = c
                return (~done) & (r < 40)

            def body(c):
                p, _, r = c
                if mode is None:
                    p2 = jnp.take(p, p)
                else:
                    p2 = p.at[p].get(mode=mode)
                return p2, jnp.all(p2 == p), r + 1

            p, _, r = jax.lax.while_loop(
                cond, body, (p, jnp.asarray(False), jnp.int32(0)))
            return p, r
        return f

    for mode in (None, "promise_in_bounds"):
        f = loop(mode)
        pfix, r = f(Pf0)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(10):
            pfix, r = f(Pf0)
        np.asarray(pfix.reshape(-1)[:1]); np.asarray(r)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"doubling loop mode={mode}: {ms:.1f} ms "
              f"(rounds={int(np.asarray(r))})", flush=True)

    # time the production resolve as-is
    @jax.jit
    def res_now(words, counts, out_lens, ctx0):
        return inflate2._resolve(words, counts, out_lens, ctx0, S)

    def sync(r):
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf.reshape(-1)[:1])

    sync(res_now(words, counts, out_lens, ctx0))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        r = res_now(words, counts, out_lens, ctx0)
    sync(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    nb = int(np.asarray(out_lens).sum())
    print(f"_resolve: {ms:.1f} ms / {nb} B "
          f"= {nb/ms/1e6:.4f} GB/s", flush=True)

    # correctness spot-check: resolve output == host decode
    out, errv = res_now(words, counts, out_lens, ctx0)
    assert int(np.asarray(errv).sum()) == 0, np.asarray(errv)
    got = b""
    outn = np.asarray(out)
    Bn = words.shape[0]
    ol = np.asarray(out_lens)
    for b in range(Bn):
        got += outn[b * S:b * S + int(ol[b])].tobytes()
    import zlib
    exp = b"".join(
        zlib.decompressobj(-15).decompress(sh) for _, sh in plans)
    print("bytes match:", got == exp, flush=True)

    # full decode_batch2 timing (the bench's device-time metric)
    from flate_tpu.jx.inflate2 import decode_batch2
    def full():
        return decode_batch2(*args, S=S, NS=NS)
    sync(full())
    t0 = time.perf_counter()
    for _ in range(n):
        r = full()
    sync(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"decode_batch2: {ms:.1f} ms = {nb/ms/1e6:.4f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
