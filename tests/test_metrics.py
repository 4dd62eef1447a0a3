"""Library-level metrics (SURVEY §5 observability obligation)."""

import flate_tpu as ft
from flate_tpu import metrics


def setup_function(_fn):
    metrics.reset()
    metrics.enable()


def teardown_function(_fn):
    metrics.disable()
    metrics.reset()


def test_compress_decompress_recorded(rfc_text):
    data = rfc_text[:64 * 1024]
    blob = ft.gzip.compress(data, level=6)
    assert ft.gzip.decompress(blob) == data
    s = metrics.summary()
    c, d = s["gzip.compress"], s["gzip.decompress"]
    assert c["calls"] == 1 and c["bytes_in"] == len(data)
    assert c["bytes_out"] == len(blob)
    assert d["bytes_in"] == len(blob) and d["bytes_out"] == len(data)
    assert c["gbps"] > 0 and d["gbps"] > 0


def test_disabled_records_nothing(rfc_text):
    metrics.disable()
    ft.gzip.compress(rfc_text[:1024], level=1)
    assert metrics.summary() == {}


def test_device_pipeline_recorded(rfc_text):
    from flate_tpu.jx import pipeline2 as pp
    data = rfc_text[:16 * 1024]
    blob = pp.compress_device2(data, level=1, shard_len=8192, ctx=1024,
                               batch=2, interpret=True)
    assert ft.gzip.decompress(blob) == data
    s = metrics.summary()
    assert s["device.compress"]["bytes_out"] == len(blob)


def test_parallel_host_decode_recorded(rfc_text):
    from flate_tpu import pinflate
    data = rfc_text[:32 * 1024]
    blob = ft.gzip.compress(data, level=6)
    assert pinflate.decompress_indexed(blob) == data
    s = metrics.summary()
    assert s["host.decompress_parallel"]["bytes_out"] == len(data)
