import pathlib, time
from flate_tpu.jx import pipeline2 as pp
import gzip as pg
data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 2560)[:64 << 20]
blob = pp.compress_device2(data, level=6)  # warm
for i in range(3):
    t0 = time.time()
    blob = pp.compress_device2(data, level=6)
    dt = time.time() - t0
    print(f"64MiB warm: {dt:.2f}s = {len(data)/dt/1e9:.4f} GB/s", flush=True)
assert pg.decompress(blob) == data
print("roundtrip OK", flush=True)
