import pathlib, time
from flate_tpu.jx import pipeline2 as pp
data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
for lv in (1, 6, 9):
    t0 = time.time()
    blob = pp.compress_device2(data, level=lv)
    print(f"warm level {lv}: {time.time()-t0:.1f}s out={len(blob)}", flush=True)
from flate_tpu.jx import inflate2
blob6 = pp.compress_device2(data, level=6)
t0 = time.time()
out = inflate2.decompress_device(blob6)
print(f"warm dev inflate: {time.time()-t0:.1f}s ok={out == data}", flush=True)
