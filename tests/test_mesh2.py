"""v2 mesh compression (shard_map + ppermute) on the 8-device CPU mesh."""

import gzip as pygzip

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import flate_tpu as ft  # noqa: E402
from flate_tpu.jx import inflate2, pipeline2  # noqa: E402
from flate_tpu.parallel.mesh2 import compress_mesh2, make_mesh  # noqa: E402

S = 7168
CTX = 1024


def _mesh_blob(data, level=6, per_device=1, **kw):
    return compress_mesh2(data, make_mesh(), level=level, shard_len=S,
                          ctx=CTX, per_device=per_device, interpret=True,
                          **kw)


def test_mesh2_roundtrip(rfc_text):
    data = (rfc_text * 3)[:8 * S + 1234]       # 8 full shards + tail
    blob = _mesh_blob(data)
    assert pygzip.decompress(blob) == data
    assert ft.gzip.decompress(blob) == data


def test_mesh2_multiple_batches(rfc_text):
    data = (rfc_text * 6)[:20 * S]             # 20 shards -> 3 mesh steps
    blob = _mesh_blob(data, level=4)
    assert pygzip.decompress(blob) == data


def test_mesh2_stream_equals_single_device(rfc_text):
    """The mesh stream must be bit-identical to the single-device v2
    stream (deterministic ordered gather + identical per-shard encode)."""
    data = (rfc_text * 3)[:8 * S]
    a = _mesh_blob(data)
    b = pipeline2.compress_device2(data, level=6, shard_len=S, ctx=CTX,
                                   batch=8, interpret=True)
    assert a == b


def test_mesh2_cross_device_context(rfc_text):
    """Period-CTX data must compress via cross-shard (cross-device)
    back-references carried by the ppermute context exchange."""
    rng = np.random.default_rng(11)
    period = bytes(rng.integers(0, 256, CTX, dtype=np.uint8))
    data = period * (8 * S // CTX)
    blob = _mesh_blob(data)
    assert pygzip.decompress(blob) == data
    assert len(blob) < CTX + len(data) // 50


def test_mesh2_device_decode(rfc_text):
    """Mesh-compressed members carry the FLT1 index and decode on the
    device inflate path."""
    data = (rfc_text * 3)[:8 * S + 99]
    blob = _mesh_blob(data)
    assert inflate2.decompress_device(blob, interpret=True) == data
