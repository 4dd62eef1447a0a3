import pathlib, time, zlib
from flate_tpu.jx import pipeline2 as pp
import gzip as pg
text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
z = len(zlib.compress(text, 6))
for K3 in (8, 0):
    pp.LEVEL_KERNEL[6] = (48, 8, True, 32, K3, True, 1024)
    blob = pp.compress_device2(text, level=6)
    t0 = time.time()
    blob = pp.compress_device2(text, level=6)
    dt = time.time() - t0
    ok = pg.decompress(blob) == text
    print(f"K3={K3}: {len(blob)} ({len(blob)/z:.4f}) warm {dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
