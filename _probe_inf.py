"""Attribute device-inflate time: host planning vs device vs D2H."""
import pathlib, time
import numpy as np
from flate_tpu.jx import pipeline2 as pp, inflate2
data = (pathlib.Path("tests/data/rfc1951.txt").read_bytes() * 640)[:4 << 20]
blob = pp.compress_device2(data, level=6)
from flate_tpu.containers import Container, parse_header
hdr_len, meta = parse_header(Container.GZIP, blob)
idx = inflate2.parse_index_extra(meta.extra)
comp_lens, out_lens = idx
starts = hdr_len + np.concatenate([[0], np.cumsum(comp_lens)[:-1]])
t0 = time.time()
plans = []
for j in range(len(comp_lens)):
    sh = blob[starts[j]:starts[j] + int(comp_lens[j])]
    plans.append(inflate2.plan_shard(sh, int(out_lens[j])))
print(f"host plan_shard x{len(comp_lens)}: {time.time()-t0:.3f}s", flush=True)
# full decode wall
inflate2.decompress_device(blob)
t0 = time.time()
out = inflate2.decompress_device(blob)
print(f"decode wall: {time.time()-t0:.2f}s ok={out == data}", flush=True)
# decode with bigger batch
t0 = time.time()
out = inflate2.decompress_device(blob, batch=32)
print(f"decode batch=32 (compile+run): {time.time()-t0:.2f}s ok={out == data}", flush=True)
t0 = time.time()
out = inflate2.decompress_device(blob, batch=32)
print(f"decode batch=32 warm: {time.time()-t0:.2f}s", flush=True)
