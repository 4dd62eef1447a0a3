"""Public-API device routing (VERDICT r4 Missing #2 / Next #3).

The reference exposes its only engine as THE public surface
(/root/reference/src/flate.zig:10-40); here ft.gzip.compress(...,
device=True) must produce the v2 device pipeline's exact bytes, and
the streaming Compressor(device=True) must interoperate with every
decoder.  Small shard shapes + interpret mode keep CPU compiles fast.
"""

import gzip as pygz
import io
import zlib

import pytest

import flate_tpu as ft
from flate_tpu.deflate import CompressOptions
from flate_tpu.jx.pipeline2 import compress_device2

S = 2048
OPTS = dict(shard_len=S, ctx=512, batch=3, interpret=True)


def _opts(level=6):
    return CompressOptions(level=level, **OPTS)


@pytest.fixture(scope="module")
def data(rfc_text):
    return rfc_text[: 5 * S + 123]


def test_oneshot_device_equals_pipeline2(data):
    blob_api = ft.gzip.compress(data, level=6, device=True, opts=_opts())
    blob_dev = compress_device2(data, level=6, shard_len=S, ctx=512,
                                batch=3, interpret=True)
    assert blob_api == blob_dev
    assert pygz.decompress(blob_api) == data


def test_oneshot_device_zlib_container(data):
    blob = ft.zlib.compress(data, level=6, device=True, opts=_opts())
    from flate_tpu.containers import Container
    assert blob == compress_device2(data, level=6, container=Container.ZLIB,
                                    shard_len=S, ctx=512, batch=3,
                                    interpret=True)
    assert zlib.decompress(blob) == data


def test_oneshot_device_writer(data):
    out = io.BytesIO()
    r = ft.gzip.compress(data, writer=out, level=6, device=True,
                         opts=_opts())
    assert r is None
    assert pygz.decompress(out.getvalue()) == data


def test_streaming_device_compressor(data):
    out = io.BytesIO()
    c = ft.gzip.compressor(out, level=6, opts=_opts(), device=True)
    # uneven writes exercise batching + cross-call context carry
    for lo in range(0, len(data), 3 * S + 17):
        c.write(data[lo:lo + 3 * S + 17])
    c.finish()
    assert pygz.decompress(out.getvalue()) == data


def test_streaming_device_flush_prefix(data):
    """After flush(), the bytes written so far decode to everything
    written so far (deflate.zig:325-337 flush contract)."""
    out = io.BytesIO()
    c = ft.flate.compressor(out, level=6, opts=_opts(), device=True)
    c.write(data[: 2 * S + 99])
    c.flush()
    import flate_tpu.inflate as inf
    d = zlib.decompressobj(wbits=-15)
    assert d.decompress(out.getvalue()) == data[: 2 * S + 99]
    c.write(data[2 * S + 99:])
    c.finish()
    from flate_tpu.containers import Container
    full, _ = inf.decompress_member(out.getvalue(), 0, Container.RAW)
    assert full == data


def test_streaming_device_dictionary(data):
    dict_ = data[:700]
    payload = data[700:][: 3 * S]
    out = io.BytesIO()
    c = ft.zlib.compressor(out, level=6, opts=_opts(), device=True,
                           dictionary=dict_)
    c.write(payload)
    c.finish()
    d = zlib.decompressobj(zdict=dict_)
    assert d.decompress(out.getvalue()) == payload
    # dictionary must actually prime the match context: the stream
    # should be smaller than the dictionary-less encoding of the same
    # prefix-repeating payload
    rep = dict_ * 4
    o1, o2 = io.BytesIO(), io.BytesIO()
    c1 = ft.flate.compressor(o1, level=6, opts=_opts(), device=True,
                             dictionary=dict_)
    c1.write(rep)
    c1.finish()
    c2 = ft.flate.compressor(o2, level=6, opts=_opts(), device=True)
    c2.write(rep)
    c2.finish()
    assert len(o1.getvalue()) < len(o2.getvalue())


def test_device_encoder_split_equals_oneshot(data):
    """Shard-aligned encode() splits must be bit-identical to one shot:
    the host-side history tail carries the exact cross-call context."""
    from flate_tpu.jx.pipeline2 import DeviceEncoder
    kw = dict(level=6, shard_len=S, ctx=512, batch=3, interpret=True)
    e1 = DeviceEncoder(**kw)
    one = e1.encode(data, final=True)
    e2 = DeviceEncoder(**kw)
    cut = 3 * S
    split = e2.encode(data[:cut]) + e2.encode(data[cut:], final=True)
    assert split == one
    assert e2.comp_lens == e1.comp_lens


def _fixed_block_case(n, level):
    """r5 soak regression: tiny incompressible inputs select FIXED
    blocks, and bytes >= 144 exercise the 9-bit fixed literal codes —
    canonical assignment over the truncated 286-symbol table shifted
    every 9-bit code by 4 (wrong-but-valid streams)."""
    import numpy as np
    import zlib as _z
    from flate_tpu.containers import Container
    rng = np.random.default_rng(1234 + n)
    d = bytes(rng.integers(128, 256, n, dtype=np.uint8))
    blob = compress_device2(d, level=level, container=Container.RAW,
                            shard_len=S, ctx=512, batch=2,
                            independent=True, interpret=True)
    assert _z.decompressobj(wbits=-15).decompress(blob) == d, \
        f"n={n} level={level}"


def test_device_fixed_block_high_literals():
    _fixed_block_case(47, 6)


@pytest.mark.slow
@pytest.mark.parametrize("n", [20, 147, 301])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_device_fixed_block_high_literals_sweep(n, level):
    _fixed_block_case(n, level)


def test_device_empty_and_tiny():
    assert pygz.decompress(
        ft.gzip.compress(b"", device=True, opts=_opts())) == b""
    assert pygz.decompress(
        ft.gzip.compress(b"x", device=True, opts=_opts())) == b"x"


def test_env_routes_to_device(data, monkeypatch):
    """FLATE_TPU_DEVICE=1 makes the device engine the default;
    device=False still forces the host path."""
    monkeypatch.setenv("FLATE_TPU_DEVICE", "1")
    blob_env = ft.gzip.compress(data, level=6, opts=_opts())
    blob_dev = compress_device2(data, level=6, shard_len=S, ctx=512,
                                batch=3, interpret=True)
    assert blob_env == blob_dev
    blob_host = ft.gzip.compress(data, level=6, device=False)
    assert blob_host != blob_dev        # host tokenizer, no FLT1 index
    assert pygz.decompress(blob_host) == data


def test_decompress_device_routing(data, monkeypatch):
    """decompress(device=True) decodes indexed members via
    jx.inflate2.decompress_device; unindexed input falls back host."""
    import functools
    from flate_tpu.jx import inflate2
    blob = ft.gzip.compress(data, level=6, device=True, opts=_opts())
    monkeypatch.setattr(
        "flate_tpu.jx.inflate2.decompress_device",
        functools.partial(inflate2.decompress_device, batch=2,
                          interpret=True))
    assert ft.gzip.decompress(blob, device=True) == data
    # unindexed (host-compressed) member: LookupError fallback
    plain = ft.gzip.compress(data, level=6)
    assert ft.gzip.decompress(plain, device=True) == data


def test_cli_tpu_uses_v2(tmp_path, data, monkeypatch):
    """gzip_cli --tpu must run the v2 pipeline (r4 Weak #6)."""
    import flate_tpu.cli.gzip_cli as cli
    seen = {}
    orig = ft.gzip.compress

    def spy(d, level=6, device=None, writer=None, **kw):
        seen["device"] = device
        return orig(d, level=level, device=True, opts=_opts(),
                    writer=writer)

    monkeypatch.setattr(ft.gzip, "compress", spy)
    p = tmp_path / "f.bin"
    p.write_bytes(data)
    assert cli.main(["--tpu", str(p)]) == 0
    assert seen["device"] is True
    assert pygz.decompress((tmp_path / "f.bin.gz").read_bytes()) == data
