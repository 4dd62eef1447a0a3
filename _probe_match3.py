import time
import numpy as np
import jax, jax.numpy as jnp
from flate_tpu.jx import match2, runs

def timeit(f, *a, n=5, warm=2, label=""):
    for _ in range(warm):
        r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(f(*a))
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

B, W = 32, 163840
win = jax.random.randint(jax.random.PRNGKey(9), (B, W), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
limit = jnp.full((B,), W, jnp.int32)
min_src = jnp.zeros((B,), jnp.int32)
timeit(lambda w: runs.small_dist_runs(w, limit, min_src), win, label="small_dist_runs pallas")
ml = jax.random.randint(jax.random.PRNGKey(3), (B, W), 0, 17, dtype=jnp.int32)
md = jax.random.randint(jax.random.PRNGKey(4), (B, W), 0, 32768, dtype=jnp.int32)
timeit(lambda a, b: runs.extend_chains(a, b, limit, cap=16), ml, md, label="extend_chains pallas")
ctx_lens = jnp.full((B,), 32768, jnp.int32)
valid = jnp.full((B,), 131072, jnp.int32)
timeit(lambda w: jax.block_until_ready(match2.find_matches_fused(w, ctx_lens, valid, K=48, nw=4, ctx=32768)[0]), win, label="find_matches_fused total")
