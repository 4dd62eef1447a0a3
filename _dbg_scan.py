"""Isolated on-chip test of _extend_chains vs CPU-precomputed expectation."""
import numpy as np, jax, jax.numpy as jnp, time
from flate_tpu.jx import match as mtc

rng = np.random.default_rng(5)
B, W = 9, 163840
mlen = rng.integers(0, 17, (B, W)).astype(np.int32)
mlen[mlen < 3] = 0
mdist = np.where(mlen > 0, rng.integers(1, 32769, (B, W)), 0).astype(np.int32)
# force some long chains: same dist, len=cap runs
for b in range(B):
    for s in range(0, W - 4096, 9173):
        L = int(rng.integers(2, 40))
        mlen[b, s:s+16*L:16] = 16
        mdist[b, s:s+16*L:16] = 777
maxlen = np.full((B, W), 258, np.int32)
t0 = time.time()
out = mtc._extend_chains(jnp.asarray(mlen), jnp.asarray(mdist),
                         jnp.asarray(maxlen), cap=16)
out = np.asarray(out)
print(f"chip extend: {time.time()-t0:.1f}s backend={jax.default_backend()}")
np.savez("_dbg_scan_tpu.npz", mlen=mlen, mdist=mdist, out=out)
print("saved")
