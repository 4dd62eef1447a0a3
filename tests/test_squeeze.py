"""Device cost-DP squeeze: must beat the greedy parse and roundtrip."""
import gzip as pygzip

import pytest

from flate_tpu.jx import pipeline2 as pp


@pytest.fixture(scope="module")
def corpus():
    with open("tests/data/rfc1951.txt", "rb") as fh:
        t = fh.read()
    return (t * 5)[:96 * 1024]


def _compress(data, level, squeeze):
    K, nw, lazy, mx, K3, _, blk = pp.LEVEL_KERNEL[level]
    saved = pp.LEVEL_KERNEL[level]
    pp.LEVEL_KERNEL[level] = (K, nw, lazy, mx, K3, squeeze, blk)
    try:
        return pp.compress_device2(data, level=level, shard_len=16384,
                                   ctx=8192, batch=8, interpret=True)
    finally:
        pp.LEVEL_KERNEL[level] = saved


def test_squeeze_beats_greedy_and_roundtrips(corpus):
    sq = _compress(corpus, 6, True)
    gr = _compress(corpus, 6, False)
    assert pygzip.decompress(sq) == corpus
    assert pygzip.decompress(gr) == corpus
    # the cost DP must strictly improve on the greedy parse
    assert len(sq) < len(gr)
    assert len(sq) < 0.98 * len(gr)


def test_squeeze_on_incompressible_data():
    import numpy as np
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 64 * 1024, dtype=np.uint8).tobytes()
    blob = _compress(data, 6, True)
    assert pygzip.decompress(blob) == data
    # stored-block fallback keeps expansion bounded
    assert len(blob) < len(data) + 1024
