"""Warm-cache stage timing at production shapes (compiles cached)."""
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
K, nw, lazy, max_lazy = pp.LEVEL_KERNEL[6]
n = arr.size

shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:n] = arr
ctx0 = np.zeros(ctx, np.uint8)
ctx_lens = np.full(batch, ctx, np.int32)
ctx_lens[0] = 0
valid = np.full(batch, S, np.int32)
finals = np.zeros(batch, np.int32)

sh = jnp.asarray(shards_np)
c0 = jnp.asarray(ctx0)
cl = jnp.asarray(ctx_lens)
vl = jnp.asarray(valid)
fn = jnp.asarray(finals)

def stage_all():
    windows = pp._prime_windows(sh, c0, ctx=ctx)
    mlen, mdist = pp.match2.find_matches_fused(windows, cl, vl, K=K, nw=nw,
                                               ctx=ctx)
    take, starts, mlen, mdist = pp._parse_stage(mlen, mdist, lazy=lazy,
                                   max_lazy=max_lazy, ctx=ctx)
    vals, bits, tb, kind = pp.encode2.build_fields(
        windows[:, ctx:], mlen[:, ctx:], mdist[:, ctx:], starts[:, ctx:],
        take[:, ctx:], vl, fn, S)
    words, tbits = pp.pk.pack_fields(vals, bits, pp._nwr(S))
    return windows, mlen, mdist, take, starts, vals, bits, words, tbits

# warm (loads cached executables)
t0 = time.time()
res = stage_all()
res[-1].block_until_ready()
print(f"warm load+run: {time.time()-t0:.1f}s", flush=True)

# per-stage steady state
windows = pp._prime_windows(sh, c0, ctx=ctx)
windows.block_until_ready()
for name, fn_ in (
    ("prime", lambda: pp._prime_windows(sh, c0, ctx=ctx)),
    ("match", lambda: pp.match2.find_matches_fused(windows, cl, vl, K=K,
                                                   nw=nw, ctx=ctx)),
):
    t0 = time.time()
    out = fn_()
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    print(f"{name}: {time.time()-t0*1:.3f}s".replace("-", " ")
          if False else f"{name}: {time.time()-t0:.3f}s", flush=True)

mlen, mdist = pp.match2.find_matches_fused(windows, cl, vl, K=K, nw=nw,
                                           ctx=ctx)
mlen.block_until_ready()
t0 = time.time()
take, starts, mlen, mdist = pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy,
                               ctx=ctx)
starts.block_until_ready()
print(f"parse: {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
vals, bits, tb, kind = pp.encode2.build_fields(
    windows[:, ctx:], mlen[:, ctx:], mdist[:, ctx:], starts[:, ctx:],
    take[:, ctx:], vl, fn, S)
vals.block_until_ready()
print(f"fields: {time.time()-t0:.3f}s", flush=True)
t0 = time.time()
words, tbits = pp.pk.pack_fields(vals, bits, pp._nwr(S))
words.block_until_ready()
print(f"pack: {time.time()-t0:.3f}s", flush=True)

# end-to-end pipelined throughput guess (batch = 4 MiB)
for trial in range(3):
    t0 = time.time()
    res = stage_all()
    res[-1].block_until_ready()
    dt = time.time() - t0
    print(f"e2e batch {trial}: {dt:.3f}s = {len(data)/dt/1e9:.3f} GB/s",
          flush=True)
