"""Chip-side staged run at production shapes; dumps intermediates."""
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 40)[:1 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
K, nw, lazy, max_lazy = pp.LEVEL_KERNEL[6]
n = arr.size
nshards = -(-n // S)

shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:n] = arr
ctx0 = np.zeros(ctx, np.uint8)
ctx_lens = np.full(batch, ctx, np.int32)
ctx_lens[0] = 0
valid = np.full(batch, S, np.int32)
for i in range(nshards):
    valid[i] = min(S, n - i * S)
valid[nshards:] = 0
finals = np.zeros(batch, np.int32)
finals[nshards - 1] = 1

NB = nshards + 1  # keep one dead row for padding behavior

t0 = time.time()
windows = pp._prime_windows(jnp.asarray(shards_np), jnp.asarray(ctx0), ctx=ctx)
windows.block_until_ready()
print(f"prime: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
mlen, mdist = pp.match2.find_matches_fused(
    windows, jnp.asarray(ctx_lens), jnp.asarray(valid), K=K, nw=nw, ctx=ctx)
mlen.block_until_ready()
print(f"match: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
take, starts, mlen, mdist = pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy,
                               ctx=ctx)
starts.block_until_ready()
print(f"parse: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
vals, bits, tb, kind = pp.encode2.build_fields(
    windows[:, ctx:], mlen[:, ctx:], mdist[:, ctx:], starts[:, ctx:],
    take[:, ctx:], jnp.asarray(valid), jnp.asarray(finals), S)
vals.block_until_ready()
print(f"fields: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
words, tbits = pp.pk.pack_fields(vals, bits, pp._nwr(S))
words.block_until_ready()
print(f"pack: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
np.savez_compressed(
    "_dbg_stage_tpu.npz",
    shards=shards_np[:NB], ctx0=ctx0, ctx_lens=ctx_lens[:NB],
    valid=valid[:NB], finals=finals[:NB],
    windows=np.asarray(windows[:NB]),
    mlen=np.asarray(mlen[:NB]), mdist=np.asarray(mdist[:NB]),
    take=np.asarray(take[:NB]), starts=np.asarray(starts[:NB]),
    vals=np.asarray(vals[:NB]), bits=np.asarray(bits[:NB]),
    kind=np.asarray(kind[:NB]),
    words=np.asarray(words[:NB]), tbits=np.asarray(tbits[:NB]))
print(f"dump: {time.time()-t0:.1f}s", flush=True)
