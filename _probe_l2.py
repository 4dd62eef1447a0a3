import pathlib, time, zlib
from flate_tpu.jx import pipeline2 as pp
import gzip as pg
text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
z = len(zlib.compress(text, 2))
blob = pp.compress_device2(text, level=2)
t0 = time.time(); blob = pp.compress_device2(text, level=2); dt = time.time()-t0
print(f"L2+squeeze: {len(blob)/z:.4f} vs zlib-2, warm {dt:.2f}s, ok={pg.decompress(blob)==text}")
