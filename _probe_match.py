"""Attribute matcher cost: sorts vs kernel vs helpers, on chip."""
import time
import numpy as np
import jax, jax.numpy as jnp
from flate_tpu.jx import match2, match as mtc

def timeit(f, *a, n=5, warm=2, label=""):
    for _ in range(warm):
        r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

B, W = 32, 163840
key = jax.random.randint(jax.random.PRNGKey(0), (B, W), 0, 1 << 31 - 1, dtype=jnp.int32).astype(jnp.uint32)
ws = [jax.random.randint(jax.random.PRNGKey(i), (B, W), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32) for i in range(1, 5)]

timeit(jax.jit(lambda k: jax.lax.sort([k], dimension=1, num_keys=1)), key, label="sort 1-operand")
timeit(jax.jit(lambda k, a, b, c, d: jax.lax.sort([k, a, b, c, d], dimension=1, num_keys=1)), key, *ws, label="sort 5-operand")
timeit(jax.jit(lambda k, a: jax.lax.sort([k, a], dimension=1, num_keys=1)), key, ws[0], label="sort 2-operand")

win = jax.random.randint(jax.random.PRNGKey(9), (B, W), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
timeit(jax.jit(lambda w: match2._hashes14(w, 4)), win, label="hashes14")
timeit(jax.jit(lambda w: match2._pack_words(w, 4)), win, label="pack_words nw=4")

maxlen = jnp.full((B, W), 258, jnp.int32)
min_src = jnp.zeros((B,), jnp.int32)
timeit(jax.jit(lambda w: mtc._small_dist_runs(w, maxlen, min_src)), win, label="small_dist_runs")
ml = jax.random.randint(jax.random.PRNGKey(3), (B, W), 0, 17, dtype=jnp.int32)
md = jax.random.randint(jax.random.PRNGKey(4), (B, W), 0, 32768, dtype=jnp.int32)
timeit(jax.jit(lambda a, b: mtc._extend_chains(a, b, maxlen, cap=16)), ml, md, label="extend_chains")

# kernel alone at production tiling
ctx_lens = jnp.full((B,), 32768, jnp.int32)
valid = jnp.full((B,), 131072, jnp.int32)
timeit(lambda w: match2.find_matches_fused(w, ctx_lens, valid, K=48, nw=4, ctx=32768), win, label="find_matches_fused total")
