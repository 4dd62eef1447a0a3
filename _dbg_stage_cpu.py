"""CPU-side comparator: recompute each stage from the chip's inputs."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platform_name", "cpu")
import jax.numpy as jnp  # noqa: E402

from flate_tpu import consts  # noqa: E402
from flate_tpu.jx import pipeline2 as pp  # noqa: E402

r = np.load("_dbg_stage_tpu.npz")
S, ctx = consts.SHARD_LEN, pp.CTX
K, nw, lazy, max_lazy = pp.LEVEL_KERNEL[6]
NB = r["shards"].shape[0]
print(f"NB={NB}", flush=True)


def cmp(name, got_chip, want_cpu):
    got = np.asarray(got_chip)
    want = np.asarray(want_cpu)
    if got.shape != want.shape:
        print(f"  {name}: SHAPE {got.shape} vs {want.shape}", flush=True)
        return
    d = np.argwhere(got != want)
    if d.size == 0:
        print(f"  {name}: OK", flush=True)
    else:
        print(f"  {name}: MISMATCH {d.shape[0]}/{want.size}; "
              f"first {d[:6].tolist()}", flush=True)
        for idx in d[:6]:
            print(f"    at {idx.tolist()}: chip {got[tuple(idx)]} "
                  f"cpu {want[tuple(idx)]}", flush=True)


stages = sys.argv[1:] or ["match", "parse", "fields", "pack"]

windows = jnp.asarray(r["windows"])
if "match" in stages:
    t0 = time.time()
    mlen, mdist = pp.match2.find_matches_fused(
        windows, jnp.asarray(r["ctx_lens"]), jnp.asarray(r["valid"]),
        K=K, nw=nw, ctx=ctx, interpret=True)
    mlen.block_until_ready()
    print(f"match cpu: {time.time()-t0:.1f}s", flush=True)
    cmp("mlen", r["mlen"], mlen)
    cmp("mdist", r["mdist"], mdist)

if "parse" in stages:
    t0 = time.time()
    take, starts = pp._parse_stage(
        jnp.asarray(r["mlen"]), jnp.asarray(r["mdist"]),
        lazy=lazy, max_lazy=max_lazy, ctx=ctx, interpret=True)
    starts.block_until_ready()
    print(f"parse cpu: {time.time()-t0:.1f}s", flush=True)
    cmp("take", r["take"], take)
    cmp("starts", r["starts"], starts)

if "fields" in stages:
    t0 = time.time()
    vals, bits, tb, kind = pp.encode2.build_fields(
        windows[:, ctx:], jnp.asarray(r["mlen"][:, ctx:]),
        jnp.asarray(r["mdist"][:, ctx:]), jnp.asarray(r["starts"][:, ctx:]),
        jnp.asarray(r["take"][:, ctx:]), jnp.asarray(r["valid"]),
        jnp.asarray(r["finals"]), S)
    vals.block_until_ready()
    print(f"fields cpu: {time.time()-t0:.1f}s", flush=True)
    cmp("vals", r["vals"], vals)
    cmp("bits", r["bits"], bits)
    cmp("kind", r["kind"], kind)

if "pack" in stages:
    t0 = time.time()
    words, tbits = pp.pk.pack_fields(
        jnp.asarray(r["vals"]), jnp.asarray(r["bits"]), pp._nwr(S),
        interpret=True)
    words.block_until_ready()
    print(f"pack cpu: {time.time()-t0:.1f}s", flush=True)
    cmp("words", r["words"], words)
    cmp("tbits", r["tbits"], tbits)

print("done", flush=True)
