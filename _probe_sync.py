import time
import numpy as np
import jax, jax.numpy as jnp
from flate_tpu.jx import match2

B, W = 32, 163840
win = jax.random.randint(jax.random.PRNGKey(9), (B, W), 0, 256, dtype=jnp.int32).astype(jnp.uint8)
ctx_lens = jnp.full((B,), 32768, jnp.int32)
valid = jnp.full((B,), 131072, jnp.int32)
f = lambda w: match2.find_matches_fused(w, ctx_lens, valid, K=48, nw=4, ctx=32768)
# warm
r = f(win); np.asarray(r[0][0, :8])
for n in (1, 5, 20):
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(win)
    s = np.asarray(r[0][0, :8])   # force completion of the last
    dt = time.perf_counter() - t0
    print(f"n={n}: total {dt*1e3:.1f} ms -> {dt/n*1e3:.1f} ms/iter", flush=True)
# and amortized with per-iter dependency (output feeds next input)
t0 = time.perf_counter()
x = win
for _ in range(20):
    r = f(x)
    x = (win + (r[0][:, :W] & 1).astype(jnp.uint8))
s = np.asarray(x[0, :8])
dt = time.perf_counter() - t0
print(f"chained 20: {dt/20*1e3:.1f} ms/iter", flush=True)
