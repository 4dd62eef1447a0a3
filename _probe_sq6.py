"""Cost/benefit of squeeze at level 6 on chip."""
import pathlib, time, zlib
from flate_tpu.jx import pipeline2 as pp
import gzip as pg
text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
z = len(zlib.compress(text, 6))
for sqz in (False, True):
    pp.LEVEL_KERNEL[6] = (48, 8, True, 32, 8, sqz, 1024)
    blob = pp.compress_device2(text, level=6)   # compile/warm
    t0 = time.time()
    blob = pp.compress_device2(text, level=6)
    dt = time.time() - t0
    ok = pg.decompress(blob) == text
    print(f"squeeze={sqz}: {len(blob)} ({len(blob)/z:.4f} vs zlib) warm {dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
