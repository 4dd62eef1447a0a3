import pathlib, time
from flate_tpu.jx import pipeline2 as pp, inflate2
data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
blob = pp.compress_device2(data, level=6)
print("compressed", len(blob), flush=True)
t0 = time.time()
out = inflate2.decompress_device(blob)
print(f"first decode: {time.time()-t0:.1f}s ok={out == data}", flush=True)
for i in range(3):
    t0 = time.time()
    out = inflate2.decompress_device(blob)
    dt = time.time() - t0
    print(f"warm {i}: {dt:.2f}s = {len(data)/dt/1e9:.4f} GB/s", flush=True)
