import pathlib, time, zlib, os
import numpy as np
from flate_tpu.jx import pipeline2 as pp, parse as prs

text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
src = []
for f in sorted(pathlib.Path("flate_tpu").rglob("*.py")):
    src.append(f.read_bytes())
srcblob = (b"".join(src) * 50)[:4 << 20]
print(f"PARSE_BLK={prs.PARSE_BLK}", flush=True)

for name, data in (("text", text), ("src", srcblob)):
    z6 = len(zlib.compress(data, 6))
    print(f"{name}: zlib6={z6}", flush=True)
    for K, nw, K3 in ((48, 16, 8), (96, 16, 16)):
        pp.LEVEL_KERNEL[6] = (K, nw, True, 32, K3)
        t0 = time.time()
        blob = pp.compress_device2(data, level=6)
        dt = time.time() - t0
        import gzip as pg
        ok = pg.decompress(blob) == data
        print(f"  K={K} nw={nw} K3={K3}: {len(blob)} ({len(blob)/z6:.4f}) "
              f"{dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
