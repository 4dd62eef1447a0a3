import pathlib, time, zlib
from flate_tpu.jx import pipeline2 as pp
text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
src = []
for f in sorted(pathlib.Path("flate_tpu").rglob("*.py")):
    src.append(f.read_bytes())
srcblob = (b"".join(src) * 50)[:4 << 20]
import gzip as pg
for name, data in (("text", text), ("src", srcblob)):
    for level in (9,):
        z = len(zlib.compress(data, level))
        t0 = time.time()
        blob = pp.compress_device2(data, level=level)
        dt = time.time() - t0
        ok = pg.decompress(blob) == data
        print(f"{name} L{level}: {len(blob)} zlib={z} ratio={len(blob)/z:.4f} {dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
        t0 = time.time()
        blob = pp.compress_device2(data, level=level)
        print(f"  warm: {time.time()-t0:.2f}s", flush=True)
