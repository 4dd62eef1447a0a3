import pathlib, time, zlib
from flate_tpu.jx import pipeline2 as pp
import gzip as pg
text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
src = []
for f in sorted(pathlib.Path("flate_tpu").rglob("*.py")):
    src.append(f.read_bytes())
srcblob = (b"".join(src) * 50)[:4 << 20]
for K, nw in ((48, 4), (64, 4)):
    pp.LEVEL_KERNEL[6] = (K, nw, True, 32, 0, True, 1024)
    for name, data in (("text", text), ("src", srcblob)):
        z = len(zlib.compress(data, 6))
        blob = pp.compress_device2(data, level=6)
        t0 = time.time()
        blob = pp.compress_device2(data, level=6)
        dt = time.time() - t0
        ok = pg.decompress(blob) == data
        print(f"K={K} nw={nw} {name}: {len(blob)/z:.4f} warm {dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
