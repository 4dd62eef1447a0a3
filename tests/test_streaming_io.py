"""True streaming I/O: O(shard)/O(TRIM) memory from any reader
(VERDICT r4 Next #5; reference: deflate.zig:304-321 — the only input
I/O point is a shard-sized read — and inflate.zig:340-353).
"""

import io
import resource
import zlib

import pytest

import flate_tpu as ft
from flate_tpu.containers import Container


class ChunkReader(io.RawIOBase):
    """Serves bytes in bounded chunks and records the high-water mark of
    outstanding requests (proxy for 'never slurped')."""

    def __init__(self, data: bytes, max_chunk: int):
        self._data = data
        self._pos = 0
        self._max = max_chunk
        self.calls = 0

    def read(self, n: int = -1) -> bytes:
        self.calls += 1
        if n < 0 or n > self._max:
            n = self._max
        chunk = self._data[self._pos:self._pos + n]
        self._pos += len(chunk)
        return chunk


def test_compress_from_reader_streams(rfc_text):
    data = rfc_text * 4
    r = ChunkReader(data, 1 << 14)
    out = io.BytesIO()
    assert ft.gzip.compress(r, writer=out) is None
    assert zlib.decompress(out.getvalue(), wbits=31) == data
    assert r.calls > 4  # really pulled incrementally


def test_decompress_from_reader_streams(rfc_text):
    data = rfc_text * 4
    gz = ft.gzip.compress(data)
    r = ChunkReader(gz, 1 << 12)
    out = io.BytesIO()
    assert ft.gzip.decompress(r, writer=out) is None
    assert out.getvalue() == data
    assert r.calls > 2


def test_decompress_reader_tiny_chunks(rfc_text):
    """97-byte pulls force mid-header/mid-symbol input exhaustion at
    every resumable point of the native stream state machine."""
    data = rfc_text[: 1 << 16]
    gz = ft.gzip.compress(data)
    d = ft.gzip.decompressor(ChunkReader(gz, 97))
    parts = []
    while True:
        c = d.read(1000)
        if not c:
            break
        parts.append(c)
    assert b"".join(parts) == data


def test_decompress_reader_concat_members(rfc_text):
    a, b = rfc_text[:50_000], rfc_text[50_000:120_000]
    gz = ft.gzip.compress(a) + ft.gzip.compress(b)
    r = ChunkReader(gz, 313)
    out = io.BytesIO()
    ft.gzip.decompress(r, writer=out)
    assert out.getvalue() == a + b


def test_decompress_reader_truncated_raises(rfc_text):
    gz = ft.gzip.compress(rfc_text[:40_000])
    r = ChunkReader(gz[:-9], 1 << 12)
    with pytest.raises(ft.errors.EndOfStream):
        ft.gzip.decompress(r, writer=io.BytesIO())


def test_decompress_reader_zlib_and_raw(rfc_text):
    data = rfc_text[:70_000]
    for ns, wrap in ((ft.zlib, lambda d: zlib.compress(d, 6)),
                     (ft.flate, lambda d: zlib.compress(d, 6)[2:-4])):
        out = io.BytesIO()
        ns.decompress(ChunkReader(wrap(data), 509), writer=out)
        assert out.getvalue() == data


def test_stream_resume_every_byte_boundary(rfc_text):
    """Drive the native InflateStream directly with the buffer extended
    ONE byte at a time (more_input=True): the checkpoint/rollback must
    resume exactly at every mid-header/mid-symbol exhaustion point."""
    from flate_tpu import native
    if not native.inflate_available():
        pytest.skip("no native decoder")
    data = rfc_text[: 1 << 14]
    raw = zlib.compress(data, 9)[2:-4]
    st = native.InflateStream(raw[:1], 0)
    out = bytearray()
    have = 1
    while not st.done:
        chunk = st.read(4096, more_input=have < len(raw))
        out += chunk
        if chunk:
            continue
        if st.need_input:
            have += 1
            st.rebase(raw[:have], 0)
        elif not st.done:
            raise AssertionError("stalled without need_input")
    assert bytes(out) == data


def test_stream_resume_random_chunks(rfc_text):
    """Randomized extension sizes + random read budgets, vs zlib."""
    import random
    from flate_tpu import native
    if not native.inflate_available():
        pytest.skip("no native decoder")
    rng = random.Random(7)
    data = rfc_text[: 1 << 15]
    raw = zlib.compress(data, 6)[2:-4]
    for _ in range(10):
        have = 1
        st = native.InflateStream(raw[:1], 0)
        out = bytearray()
        while not st.done:
            chunk = st.read(rng.randrange(1, 700),
                            more_input=have < len(raw))
            out += chunk
            if not chunk and st.need_input:
                have = min(len(raw), have + rng.randrange(1, 97))
                st.rebase(raw[:have], 0)
        assert bytes(out) == data


class _NullWriter:
    def __init__(self):
        self.n = 0

    def write(self, b):
        self.n += len(b)


@pytest.mark.slow
def test_compress_rss_bounded(rfc_text):
    """Compressing 64 MiB from a pipe-like reader must hold bounded
    host memory (VERDICT target scaled: <50 MB extra for 177 MB)."""
    data = (rfc_text * (64 * 1024 * 1024 // len(rfc_text) + 1))[
        : 64 * 1024 * 1024]
    # warm the code paths so lazy imports/buffers don't count
    ft.gzip.compress(ChunkReader(data[: 1 << 20], 1 << 17),
                     writer=_NullWriter(), level=1)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    r = ChunkReader(data, 1 << 17)
    w = _NullWriter()
    ft.gzip.compress(r, writer=w, level=1)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert w.n > 0
    # ru_maxrss is KiB on Linux; allow 24 MiB of slack (numpy temps)
    assert rss1 - rss0 < 24 * 1024, f"RSS grew {(rss1 - rss0) / 1024} MiB"
    del data


@pytest.mark.slow
def test_decompress_rss_bounded(rfc_text):
    data = (rfc_text * (64 * 1024 * 1024 // len(rfc_text) + 1))[
        : 64 * 1024 * 1024]
    blob = zlib.compress(data, 1)
    # warm the code paths (truncated stream is fine for warming)
    try:
        ft.zlib.decompress(ChunkReader(blob[: 1 << 20], 1 << 17),
                           writer=_NullWriter())
    except ft.errors.EndOfStream:
        pass
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    w = _NullWriter()
    ft.zlib.decompress(ChunkReader(blob, 1 << 17), writer=w)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert w.n == len(data)
    assert rss1 - rss0 < 24 * 1024, f"RSS grew {(rss1 - rss0) / 1024} MiB"
