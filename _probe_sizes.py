"""Size and speed vs (K, nw) at production shapes on chip."""
import pathlib, time, zlib
import numpy as np
import jax.numpy as jnp
from flate_tpu import consts
from flate_tpu.jx import pipeline2 as pp

text = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
rng = np.random.default_rng(5)
src = []
for f in sorted(pathlib.Path("flate_tpu").rglob("*.py")):
    src.append(f.read_bytes())
srcblob = (b"".join(src) * 50)[:4 << 20]

for name, data in (("text", text), ("src", srcblob)):
    z6 = len(zlib.compress(data, 6))
    print(f"{name}: zlib6={z6}", flush=True)
    for K, nw in ((8, 2), (16, 2), (16, 4), (24, 4), (48, 4)):
        pp.LEVEL_KERNEL[6] = (K, nw, True, 32, 8)
        t0 = time.time()
        blob = pp.compress_device2(data, level=6)
        dt = time.time() - t0
        import gzip as pg
        ok = pg.decompress(blob) == data
        print(f"  K={K} nw={nw}: {len(blob)} ({len(blob)/z6:.4f} vs zlib) "
              f"{dt:.2f}s {'OK' if ok else 'FAIL'}", flush=True)
