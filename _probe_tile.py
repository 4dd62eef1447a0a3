import pathlib, time
import numpy as np, jax, jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp, match2

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:arr.size] = arr
sh = jnp.asarray(shards_np)
c0 = jnp.asarray(np.zeros(ctx, np.uint8))
cl = jnp.asarray(np.full(batch, ctx, np.int32))
vl = jnp.asarray(np.full(batch, S, np.int32))
windows = pp._prime_windows(sh, c0, ctx=ctx)
np.asarray(windows[0, :1])

def amort(f, n=15, label=""):
    r = f(); np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

print(f"TILE={match2.TILE}", flush=True)
amort(lambda: match2.find_matches_fused(windows, cl, vl, K=48, nw=8, ctx=ctx, K3=0), label="match K=48 nw=8")
