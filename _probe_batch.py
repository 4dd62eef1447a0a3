import pathlib, time
import numpy as np, jax, jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

data16 = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:16 << 20]
for batch in (32, 64):
    t0 = time.time()
    blob = pp.compress_device2(data16, level=6, batch=batch)
    dt = time.time() - t0
    print(f"batch={batch} first: {dt:.2f}s", flush=True)
    for i in range(2):
        t0 = time.time()
        blob = pp.compress_device2(data16, level=6, batch=batch)
        dt = time.time() - t0
        print(f"batch={batch} warm: {dt:.2f}s = {len(data16)/dt/1e9:.4f} GB/s", flush=True)
