import pathlib, time, os
import numpy as np, jax, jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
K, nw, lazy, max_lazy, K3 = pp.LEVEL_KERNEL[6]
print(f"config K={K} nw={nw} K3={K3} variant={os.environ.get('FLATE_TPU_MATCH_KERNEL','roll')}", flush=True)
shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:arr.size] = arr
sh = jnp.asarray(shards_np)
c0 = jnp.asarray(np.zeros(ctx, np.uint8))
cl = jnp.asarray(np.full(batch, ctx, np.int32))
vl = jnp.asarray(np.full(batch, S, np.int32))
fn = jnp.asarray(np.zeros(batch, np.int32))
windows = pp._prime_windows(sh, c0, ctx=ctx)
np.asarray(windows[0, :1])

def amort(f, n=15, label=""):
    r = f(); np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

amort(lambda: pp.match2.find_matches_fused(windows, cl, vl, K=K, nw=nw, ctx=ctx, K3=K3), label="match")
mlen, mdist = pp.match2.find_matches_fused(windows, cl, vl, K=K, nw=nw, ctx=ctx, K3=K3)
amort(lambda: pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx), label="parse")
take, starts, mlen2, mdist2 = pp._parse_stage(mlen, mdist, lazy=lazy, max_lazy=max_lazy, ctx=ctx)
amort(lambda: pp.encode2.build_fields(windows[:, ctx:], mlen2[:, ctx:], mdist2[:, ctx:], starts[:, ctx:], take[:, ctx:], vl, fn, S), label="fields")
vals, bits, tb, kind = pp.encode2.build_fields(windows[:, ctx:], mlen2[:, ctx:], mdist2[:, ctx:], starts[:, ctx:], take[:, ctx:], vl, fn, S)
amort(lambda: pp.pk.pack_fields(vals, bits, pp._nwr(S)), label="pack")
amort(lambda: pp.encode_batch_staged(sh, c0, cl, vl, fn, S=S, ctx=ctx, K=K, nw=nw, lazy=lazy, max_lazy=max_lazy, K3=K3), label="staged e2e")
