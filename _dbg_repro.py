"""Reproduce the chip corruption and localize differing bytes/shards."""
import pathlib
import sys
import time
import zlib

import numpy as np

from flate_tpu.jx import pipeline2

data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 40)[:1 << 20]
S = int(sys.argv[1]) if len(sys.argv) > 1 else 128 * 1024
t0 = time.time()
blob = pipeline2.compress_device2(data, level=6, shard_len=S)
print(f"compress: {time.time()-t0:.1f}s out={len(blob)}", flush=True)
out = zlib.decompress(blob[10:], wbits=-15) if False else None
import gzip as pg
try:
    got = pg.decompress(blob)
    print("roundtrip:", got == data)
    if got == data:
        sys.exit(0)
except Exception as e:
    print("decompress error:", e)
    # decode raw deflate ignoring CRC
    d = zlib.decompressobj(wbits=-15)
    # skip gzip header (flags may include FEXTRA)
    flg = blob[3]
    off = 10
    if flg & 4:
        xlen = int.from_bytes(blob[off:off + 2], "little")
        off += 2 + xlen
    got = d.decompress(blob[off:])
print(f"lens: got={len(got)} want={len(data)}")
a = np.frombuffer(got, np.uint8)
b = np.frombuffer(data[:len(got)], np.uint8)
n = min(len(a), len(b))
d = np.nonzero(a[:n] != b[:n])[0]
print(f"diff bytes: {d.size}")
if d.size:
    print("first diffs:", d[:10].tolist())
    print("last diffs:", d[-10:].tolist())
    print("shards touched:", sorted(set((d // S).tolist()))[:50])
    i = int(d[0])
    print("around first diff:")
    print("  got :", got[max(0, i - 20):i + 20])
    print("  want:", data[max(0, i - 20):i + 20])
