"""On-chip v2 stage differential against _dbg_ref.npz (see _dbg_ref.py)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from flate_tpu.jx import match2, encode2, pack as pk
from flate_tpu.jx import parse as prs

r = np.load("_dbg_ref.npz")
B, W = r["windows"].shape
CTX = W - r["shards"].shape[1]
S = r["shards"].shape[1]
print(f"backend={jax.default_backend()} B={B} S={S} CTX={CTX}", flush=True)

windows = jnp.asarray(r["windows"])
ctx_lens = jnp.asarray(r["ctx_lens"])
valid = jnp.asarray(r["valid"])
finals = jnp.asarray(r["finals"])

def cmp(name, got, want):
    got = np.asarray(got)
    ok = got.shape == want.shape and (got == want).all()
    if ok:
        print(f"  {name}: OK", flush=True)
    else:
        d = np.argwhere(got != want)
        print(f"  {name}: MISMATCH {d.shape[0]}/{want.size} cells; "
              f"first {d[:5].tolist()}", flush=True)
        for idx in d[:5]:
            print(f"    at {idx.tolist()}: got {got[tuple(idx)]} "
                  f"want {want[tuple(idx)]}", flush=True)
    return ok

stage = sys.argv[1] if len(sys.argv) > 1 else "all"

if stage in ("all", "match", "matcha"):
    for tag, k, nw in (("a", 8, 2),) + ((("b", 48, 4),) if stage != "matcha" else ()):
        t0 = time.time()
        mlen, mdist = match2.find_matches_fused(
            windows, ctx_lens, valid, K=k, nw=nw, ctx=CTX)
        mlen.block_until_ready()
        print(f"match[{tag}] K={k} nw={nw}: {time.time()-t0:.1f}s", flush=True)
        cmp(f"mlen_{tag}", mlen, r[f"mlen_{tag}"])
        cmp(f"mdist_{tag}", mdist, r[f"mdist_{tag}"])

if stage in ("all", "parse"):
    mlen, mdist = jnp.asarray(r["mlen_b"]), jnp.asarray(r["mdist_b"])
    t0 = time.time()
    take, _ = prs.decide(mlen, mdist, True, 32)
    starts = prs.parse_walk(mlen, mdist, start=CTX, lazy=True, max_lazy=32)
    starts.block_until_ready()
    print(f"parse: {time.time()-t0:.1f}s", flush=True)
    cmp("take", take, r["take"])
    cmp("starts", starts, r["starts"])

if stage in ("all", "fields"):
    t0 = time.time()
    vals, bits, tb, kind = encode2.build_fields(
        windows[:, CTX:], jnp.asarray(r["mlen_b"][:, CTX:]),
        jnp.asarray(r["mdist_b"][:, CTX:]),
        jnp.asarray(r["starts"][:, CTX:]), jnp.asarray(r["take"][:, CTX:]),
        valid, finals, S)
    vals.block_until_ready()
    print(f"fields: {time.time()-t0:.1f}s", flush=True)
    cmp("vals", vals, r["vals"])
    cmp("bits", bits, r["bits"])
    cmp("kind", kind, r["kind"])

if stage in ("all", "pack"):
    t0 = time.time()
    words, tbits = pk.pack_fields(
        jnp.asarray(r["vals"]), jnp.asarray(r["bits"]), int(r["nwr"]))
    words.block_until_ready()
    print(f"pack: {time.time()-t0:.1f}s", flush=True)
    cmp("words", words, r["words"])
    cmp("tbits", tbits, r["tbits"])

print("done", flush=True)
