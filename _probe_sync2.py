import time
import numpy as np
import jax, jax.numpy as jnp
from flate_tpu.jx import match2, runs

def amort(f, *a, n=20, label=""):
    r = f(*a); np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

B, W = 32, 163840
key = jax.random.randint(jax.random.PRNGKey(0), (B, W), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
ws = [jax.random.randint(jax.random.PRNGKey(i), (B, W), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32) for i in range(1, 5)]
win = jax.random.randint(jax.random.PRNGKey(9), (B, W), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
limit = jnp.full((B,), W, jnp.int32)
zero = jnp.zeros((B,), jnp.int32)

amort(jax.jit(lambda k, a, b, c, d: jax.lax.sort([k, a, b, c, d], dimension=1, num_keys=1)), key, *ws, label="sort5")
amort(jax.jit(lambda k, a: jax.lax.sort([k, a], dimension=1, num_keys=1)), key, ws[0], label="sort2")
amort(jax.jit(lambda w: match2._hashes14(w, 4)), win, label="hashes14")
amort(jax.jit(lambda w: match2._pack_words(w, 4)), win, label="pack_words")
amort(lambda w: runs.small_dist_runs(w, limit, zero), win, label="small_runs")
ml = jax.random.randint(jax.random.PRNGKey(3), (B, W), 0, 17, dtype=jnp.int32)
md = jax.random.randint(jax.random.PRNGKey(4), (B, W), 0, 32768, dtype=jnp.int32)
amort(lambda a, b: runs.extend_chains(a, b, limit, cap=16), ml, md, label="extend")
ctx_lens = jnp.full((B,), 32768, jnp.int32)
valid = jnp.full((B,), 131072, jnp.int32)
amort(lambda w: match2.find_matches_fused(w, ctx_lens, valid, K=48, nw=4, ctx=32768), win, label="fused total")
amort(lambda w: match2.find_matches_fused(w, ctx_lens, valid, K=8, nw=2, ctx=32768), win, label="fused K=8 nw=2")
