import pathlib, time
import numpy as np
import jax, jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

def amort(f, *a, n=15, label=""):
    r = f(*a); np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
K, nw, lazy, max_lazy = 48, 4, True, 32
shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:arr.size] = arr
sh = jnp.asarray(shards_np)
c0 = jnp.asarray(np.zeros(ctx, np.uint8))
cl = jnp.asarray(np.full(batch, ctx, np.int32))
vl = jnp.asarray(np.full(batch, S, np.int32))
fn = jnp.asarray(np.zeros(batch, np.int32))

windows = pp._prime_windows(sh, c0, ctx=ctx)
mlen, mdist = pp.match2.find_matches_fused(windows, cl, vl, K=K, nw=nw, ctx=ctx)
take, starts, mlen, mdist = pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx)
vals, bits, tb, kind = pp.encode2.build_fields(
    windows[:, ctx:], mlen[:, ctx:], mdist[:, ctx:], starts[:, ctx:],
    take[:, ctx:], vl, fn, S)
np.asarray(vals[0, :1])

amort(lambda: pp._prime_windows(sh, c0, ctx=ctx), label="prime")
amort(lambda: pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx), label="parse")
amort(lambda: pp.encode2.build_fields(
    windows[:, ctx:], mlen[:, ctx:], mdist[:, ctx:], starts[:, ctx:],
    take[:, ctx:], vl, fn, S), label="fields")
amort(lambda: pp.pk.pack_fields(vals, bits, pp._nwr(S)), label="pack")
amort(lambda: pp.encode_batch(sh, c0, cl, vl, fn, S=S, ctx=ctx, K=K, nw=nw,
                              lazy=lazy, max_lazy=max_lazy), label="fused e2e")
