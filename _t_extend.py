import numpy as np, jax
jax.config.update("jax_platform_name", "cpu")
import jax.numpy as jnp
from flate_tpu.jx import match as mtc

rng = np.random.default_rng(5)
B, W, cap = 3, 8192, 16
mlen = rng.integers(0, 17, (B, W)).astype(np.int32)
mlen[mlen < 3] = 0
mdist = np.where(mlen > 0, rng.integers(1, 32769, (B, W)), 0).astype(np.int32)
for b in range(B):
    for s in range(0, W - 2048, 917):
        L = int(rng.integers(2, 40))
        mlen[b, s:s+16*L:16] = 16
        mdist[b, s:s+16*L:16] = 777
maxlen = np.full((B, W), 258, np.int32)
pad = (-W) % cap
ml = np.pad(mlen, ((0,0),(0,pad))); md = np.pad(mdist, ((0,0),(0,pad)))
want = np.zeros_like(ml)
for b in range(B):
    for lane in range(cap):
        col_l = ml[b, lane::cap]; col_d = md[b, lane::cap]
        res = np.zeros_like(col_l)
        for i in range(len(col_l) - 1, -1, -1):
            if col_l[i] == cap and i + 1 < len(col_l) and col_d[i+1] == col_d[i] and col_d[i] > 0:
                res[i] = min(cap + res[i+1], 10**6)
            else:
                res[i] = col_l[i]
        want[b, lane::cap] = res
want = np.minimum(want[:, :W], 258)
want = np.minimum(want, maxlen)
got = np.asarray(mtc._extend_chains(jnp.asarray(mlen), jnp.asarray(mdist), jnp.asarray(maxlen), cap=cap))
print("new impl matches brute force:", bool((got == want).all()))
