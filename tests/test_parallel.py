"""Multi-device data-parallel compression on the virtual 8-device CPU mesh."""

import gzip as pygzip

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import flate_tpu as ft  # noqa: E402
from flate_tpu.parallel import combined_crc32, compress_mesh, make_mesh  # noqa: E402


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_compress_mesh_roundtrip(rfc_text):
    mesh = make_mesh()
    data = (rfc_text * 3)[:8 * 4096 + 1234]   # 8 full shards + remainder
    blob = compress_mesh(data, mesh, level=6, shard_len=4096, ctx=4096)
    assert ft.gzip.decompress(blob) == data
    assert pygzip.decompress(blob) == data


def test_compress_mesh_multiple_batches(rfc_text):
    mesh = make_mesh()
    data = (rfc_text * 6)[:20 * 4096]          # 20 shards -> 3 mesh steps
    blob = compress_mesh(data, mesh, level=4, shard_len=4096, ctx=4096)
    assert pygzip.decompress(blob) == data


def test_combined_crc_matches_serial(rfc_text):
    import zlib
    parts = [rfc_text[i:i + 7000] for i in range(0, len(rfc_text), 7000)]
    assert combined_crc32(parts) == zlib.crc32(rfc_text) & 0xFFFFFFFF


def test_mesh_output_matches_single_device(rfc_text):
    """Sharded and single-device pipelines produce identical streams
    (deterministic ordered gather)."""
    from flate_tpu.jx.pipeline import compress_device
    mesh = make_mesh()
    data = (rfc_text * 3)[:8 * 4096]
    a = compress_mesh(data, mesh, level=6, shard_len=4096, ctx=4096)
    b = compress_device(data, level=6, shard_len=4096, ctx=4096, batch=8)
    assert a == b
