"""Fast-tier smokes for kernel families whose full files are slow.

One small end-to-end case per family (conftest.SLOW_FILES), so
`pytest -m "not slow"` still exercises: the v2 device encode pipeline
(via test_api_device.py), the device indexed inflate (jx.inflate2),
the mesh shard_map path (parallel.mesh2), and the squeeze parse DP.
"""

import gzip as pygz

import pytest

from flate_tpu.jx import inflate2, pipeline2

S = 4096
CTX = 512


@pytest.fixture(scope="module")
def data(rfc_text):
    return rfc_text[: 2 * S + 333]


def test_device_inflate_smoke(data):
    blob = pipeline2.compress_device2(data, level=6, shard_len=S, ctx=CTX,
                                      batch=2, interpret=True)
    assert pygz.decompress(blob) == data
    assert inflate2.decompress_device(blob, batch=2, interpret=True) == data


def test_mesh2_smoke(rfc_text):
    from flate_tpu.parallel.mesh2 import compress_mesh2, make_mesh
    data = rfc_text[: 8 * S]
    blob = compress_mesh2(data, make_mesh(), level=6, shard_len=S, ctx=CTX,
                          per_device=1, interpret=True)
    assert pygz.decompress(blob) == data


@pytest.mark.slow
def test_level9_squeeze_smoke(data):
    """Level 9 runs the deepest kernel config (K3 pass + squeeze DP)."""
    blob = pipeline2.compress_device2(data, level=9, shard_len=S, ctx=CTX,
                                      batch=2, interpret=True)
    assert pygz.decompress(blob) == data
