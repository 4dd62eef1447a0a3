"""Size ablation for device-time levers (round-5 sort/squeeze work).

Measures compressed-size impact (vs zlib, prod shapes, CPU interpret)
of the candidate device-time reductions before any is adopted:
  - level-6 carry nw 8 -> 4 (halves the 9-operand sort payload)
  - K 48 -> 32 (fewer matcher candidates)
  - squeeze grid_only=True (drops the per-step one-hot DP read)
Run: python tools/size_ablation.py
"""
import functools
import gzip as pygzip
import json
import time
import zlib

import jax
import numpy as np

from flate_tpu.jx import pipeline2 as pp
from flate_tpu.jx import squeeze as sq


def _text(n):
    t = open("tests/data/rfc1951.txt", "rb").read()
    return (t * (n // len(t) + 1))[:n]


def _binary(n):
    rng = np.random.default_rng(3)
    t = _text(n // 2)
    r = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    return ((t + r) * 2)[:n]


VARIANTS = {
    "base_48_8": ((48, 8, True, 32, 0, True, 1024), False),
    "nw4_48_4": ((48, 4, True, 32, 0, True, 1024), False),
    "k32_32_8": ((32, 8, True, 32, 0, True, 1024), False),
    "k32_nw4": ((32, 4, True, 32, 0, True, 1024), False),
    "gridonly_48_8": ((48, 8, True, 32, 0, True, 1024), True),
    "gridonly_nw4": ((48, 4, True, 32, 0, True, 1024), True),
}

_orig_squeeze = sq.squeeze_parse


def main():
    corp = {"text": _text(96 * 1024), "binary": _binary(96 * 1024)}
    zl = {k: len(zlib.compress(v, 6)) for k, v in corp.items()}
    res = {}
    orig_cfg = pp.LEVEL_KERNEL[6]
    for name, (cfg, grid_only) in VARIANTS.items():
        pp.LEVEL_KERNEL[6] = cfg
        sq.squeeze_parse = (functools.partial(_orig_squeeze,
                                              grid_only=True)
                            if grid_only else _orig_squeeze)
        jax.clear_caches()
        row = {}
        for cname, data in corp.items():
            t0 = time.time()
            blob = pp.compress_device2(data, level=6, shard_len=131072,
                                       ctx=32768, batch=1, interpret=True)
            assert pygzip.decompress(blob) == data
            row[cname] = round(len(blob) / zl[cname], 4)
            row[f"{cname}_s"] = round(time.time() - t0, 1)
        res[name] = row
        print(name, row, flush=True)
    pp.LEVEL_KERNEL[6] = orig_cfg
    sq.squeeze_parse = _orig_squeeze
    print(json.dumps(res))


if __name__ == "__main__":
    main()
