"""Fused encode_batch at production shape: compile cost + warm timing."""
import pathlib, time
import numpy as np, jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
arr = np.frombuffer(data, np.uint8)
S, ctx, batch = consts.SHARD_LEN, pp.CTX, 32
K, nw, lazy, max_lazy = pp.LEVEL_KERNEL[6]
shards_np = np.zeros((batch, S), np.uint8)
shards_np.reshape(-1)[:arr.size] = arr
args = (jnp.asarray(shards_np), jnp.asarray(np.zeros(ctx, np.uint8)),
        jnp.asarray(np.full(batch, ctx, np.int32)),
        jnp.asarray(np.full(batch, S, np.int32)),
        jnp.asarray(np.zeros(batch, np.int32)))
t0 = time.time()
w, tb, kd = pp.encode_batch(*args, S=S, ctx=ctx, K=K, nw=nw, lazy=lazy,
                            max_lazy=max_lazy)
w.block_until_ready()
print(f"fused compile+run: {time.time()-t0:.1f}s", flush=True)
for i in range(3):
    t0 = time.time()
    w, tb, kd = pp.encode_batch(*args, S=S, ctx=ctx, K=K, nw=nw, lazy=lazy,
                                max_lazy=max_lazy)
    w.block_until_ready()
    dt = time.time() - t0
    print(f"fused warm {i}: {dt:.3f}s = {len(data)/dt/1e9:.3f} GB/s", flush=True)
