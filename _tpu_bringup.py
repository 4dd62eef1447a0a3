"""Real-chip bring-up of the v2 pipeline: compile + correctness + timing."""
import time, sys, zlib, pathlib
import numpy as np
import jax

t0 = time.time()
from flate_tpu.jx import pipeline2
from flate_tpu.containers import Container
print(f"[{time.time()-t0:6.1f}s] imports done, backend={jax.default_backend()}", flush=True)

data = (pathlib.Path('tests/data/rfc1951.txt').read_bytes() * 40)[:1 << 20]
t1 = time.time()
blob = pipeline2.compress_device2(data, level=6)
t2 = time.time()
print(f"[{t2-t0:6.1f}s] first compress 1MiB: {t2-t1:.1f}s, out={len(blob)}", flush=True)
import gzip as pg
assert pg.decompress(blob) == data
print("roundtrip OK", flush=True)
z = len(zlib.compress(data, 6))
print(f"size ours={len(blob)} zlib={z} ratio={(len(blob))/z:.4f}", flush=True)

# warm timing, larger input
data16 = (pathlib.Path('tests/data/rfc1951.txt').read_bytes() * 640)[:16 << 20]
t1 = time.time()
blob = pipeline2.compress_device2(data16, level=6)
t2 = time.time()
gbs = len(data16) / (t2 - t1) / 1e9
print(f"warm 16MiB: {t2-t1:.2f}s = {gbs:.4f} GB/s out={len(blob)}", flush=True)
assert pg.decompress(blob) == data16
print("16MiB roundtrip OK", flush=True)
