"""Device-path compressed-size tracking vs zlib.

The HOST path beats zlib at every level (tests/test_sizes.py).  The
DEVICE path trades ~4% size for massive parallelism today (K-recent
candidates, 4*nw-byte length cap + chain extension, 1 KiB parse-block
truncation — see STATUS.md); these tests pin the current bound so
ratio regressions fail loudly, and tighten as the matcher improves.
Target: <= zlib at every level (BASELINE.md).
"""
import gzip as pygzip
import zlib

import numpy as np
import pytest

from flate_tpu.jx import pipeline2 as pp

# current measured device/zlib ratio + ~0.5% slack; ratchet DOWN over
# time (keys: (level, corpus)).  r4: the k-row context carry gives
# 16K shards the full 32K window, taking every config BELOW zlib
# (measured text .980/.990/.984, binary .953/.961/.958 at 1/6/9 —
# the r3 >1.0 concessions are gone)
DEVICE_RATIO_BOUND = {
    (1, "text"): 0.985, (1, "binary"): 0.960,
    (6, "text"): 0.995, (6, "binary"): 0.967,
    (9, "text"): 0.990, (9, "binary"): 0.965,
}

# production shard size (131072 + 32K ctx): the config the bench ladder
# and BASELINE target measure.  With intra-shard block segmentation the
# device path BEATS zlib on BOTH corpora at EVERY level 1-9 (BASELINE
# "compressed size <= reference at same level": satisfied with margin).
# Bounds = round-5 measured ratio + ~0.5% slack; ratchet DOWN.
PROD_RATIO_BOUND = {
    (1, "text"): 0.983, (1, "binary"): 0.960,
    (2, "text"): 0.946, (2, "binary"): 0.945,
    (3, "text"): 0.972, (3, "binary"): 0.956,
    (4, "text"): 0.979, (4, "binary"): 0.962,
    (5, "text"): 0.985, (5, "binary"): 0.965,
    (6, "text"): 0.992, (6, "binary"): 0.968,
    (7, "text"): 0.986, (7, "binary"): 0.964,
    (8, "text"): 0.987, (8, "binary"): 0.964,
    (9, "text"): 0.986, (9, "binary"): 0.964,
}


def _text(n):
    with open("tests/data/rfc1951.txt", "rb") as fh:
        t = fh.read()
    return (t * (n // len(t) + 1))[:n]


def _binary(n):
    rng = np.random.default_rng(3)
    t = _text(n // 2)
    r = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    return ((t + r) * 2)[:n]


@pytest.mark.parametrize("level", [1, 6, 9])
@pytest.mark.parametrize("corpus", ["text", "binary"])
def test_device_size_vs_zlib(level, corpus):
    data = _text(96 * 1024) if corpus == "text" else _binary(96 * 1024)
    blob = pp.compress_device2(data, level=level, shard_len=16384,
                               ctx=32768, batch=8, interpret=True)
    assert pygzip.decompress(blob) == data
    z = len(zlib.compress(data, level))
    ratio = len(blob) / z
    assert ratio <= DEVICE_RATIO_BOUND[(level, corpus)], \
        f"device/zlib ratio {ratio:.4f} exceeds bound at level {level}"


@pytest.mark.parametrize("level,corpus", sorted(PROD_RATIO_BOUND))
def test_device_size_vs_zlib_production_shards(level, corpus):
    data = _text(96 * 1024) if corpus == "text" else _binary(96 * 1024)
    blob = pp.compress_device2(data, level=level, shard_len=131072,
                               ctx=32768, batch=1, interpret=True)
    assert pygzip.decompress(blob) == data
    z = len(zlib.compress(data, level))
    ratio = len(blob) / z
    assert ratio <= PROD_RATIO_BOUND[(level, corpus)], \
        f"device/zlib ratio {ratio:.4f} exceeds bound at level {level}"


def test_device_size_level9_zlib_container():
    """BASELINE configs[3]: level-9 zlib container (Adler32) at prod
    shards must also beat zlib (measured r5: 0.9781)."""
    import zlib as _z
    from flate_tpu.containers import Container
    data = _text(256 * 1024)
    blob = pp.compress_device2(data, level=9, container=Container.ZLIB,
                               shard_len=131072, ctx=32768, batch=2,
                               interpret=True)
    assert _z.decompress(blob) == data
    ratio = len(blob) / len(_z.compress(data, 9))
    assert ratio <= 0.984, f"level-9 zlib ratio {ratio:.4f}"


def test_device_beats_store_and_huffman():
    data = _text(64 * 1024)
    blob = pp.compress_device2(data, level=6, shard_len=16384,
                               ctx=8192, batch=8, interpret=True)
    assert len(blob) < len(data) // 2
