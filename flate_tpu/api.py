"""Public API: one-shot and streaming compress/decompress per container.

Mirrors the reference's 6-function surface per container module
(/root/reference/src/flate.zig:10-71, gzip.zig, zlib.zig — documented at
readme.md:100-125):

    compress(data|reader, writer=None, level=...) -> bytes | None
    decompress(data|reader, writer=None) -> bytes | None
    Compressor(writer, level) -> .write()/.flush()/.finish()/.set_writer()
    Decompressor(reader) -> .read()/.reset()/.set_reader()
    huffman.* / store.* sub-mode namespaces

plus the v1 capabilities the modern reference dropped (SURVEY §2.3): levels
1-3 and gzip header metadata.
"""

from __future__ import annotations

import io
from types import SimpleNamespace
from typing import Optional

import numpy as np

from . import consts
from .bitpack import BitSink
from .block import Tokens, write_block, write_flush_marker, write_huffman_only, write_stored
from .containers import Container, GzipMetadata, Hasher, write_footer, write_header
from .deflate import CompressOptions, deflate_tokens, tokenize_shard
from .inflate import decompress_member


def _to_bytes(src) -> bytes:
    if isinstance(src, (bytes, bytearray, memoryview)):
        return bytes(src)
    return src.read()


class Compressor:
    """Streaming compressor: write()/flush()/finish(), reset(), set_writer().

    Buffers input into shard-sized chunks and encodes each with the parallel
    pipeline; flush() force-encodes buffered data and emits the byte-sync
    marker (empty stored block), matching deflate.zig:325-337 semantics so a
    reader can decode everything produced so far.
    """

    def __init__(self, writer, container: Container = Container.RAW,
                 level: int = consts.LEVEL_DEFAULT,
                 meta: Optional[GzipMetadata] = None,
                 opts: Optional[CompressOptions] = None,
                 dictionary: Optional[bytes] = None,
                 device: bool = False):
        self._writer = writer
        self._container = container
        self._opts = opts or CompressOptions(level=level)
        self._opts.level = level if opts is None else self._opts.level
        self._meta = meta
        self._dictionary = dictionary
        self._mode = "deflate"
        self._device = device
        self._start()

    def _start(self) -> None:
        self._hasher = Hasher(self._container)
        self._buf = bytearray()
        # preset dictionary primes the first shard's match context
        # (v1 parity: v1/deflate/compressor.zig:205-224)
        self._context = bytes(self._dictionary or b"")
        self._finished = False
        self._dev_enc = None
        self._writer.write(write_header(self._container, self._meta,
                                        self._dictionary))

    def _enc(self):
        """Lazy device encoder (jx.pipeline2.DeviceEncoder): created on
        first device-path use so host-only callers never import jax."""
        if self._dev_enc is None:
            from .jx.pipeline2 import CTX, DeviceEncoder
            o = self._opts
            self._dev_enc = DeviceEncoder(
                level=o.level, shard_len=o.shard_len,
                ctx=o.ctx or CTX, batch=o.batch,
                dictionary=self._dictionary, interpret=o.interpret)
        return self._dev_enc

    def _device_active(self) -> bool:
        return self._device and self._mode == "deflate"

    # -- sub-mode constructors -------------------------------------------
    @classmethod
    def huffman_only(cls, writer, container: Container = Container.RAW,
                     meta: Optional[GzipMetadata] = None) -> "Compressor":
        c = cls(writer, container, meta=meta)
        c._mode = "huffman"
        return c

    @classmethod
    def store_only(cls, writer, container: Container = Container.RAW,
                   meta: Optional[GzipMetadata] = None) -> "Compressor":
        c = cls(writer, container, meta=meta)
        c._mode = "store"
        return c

    # --------------------------------------------------------------------
    def write(self, data: bytes) -> int:
        assert not self._finished, "write after finish"
        self._hasher.update(data)
        self._buf += data
        if self._device_active():
            # device path: encode whole batches (batch * shard_len) per
            # dispatch; every shard stream ends with the sync marker so
            # each write to the underlying writer is a decodable prefix
            step = self._opts.batch * self._opts.shard_len
            while len(self._buf) >= step:
                chunk = bytes(self._buf[:step])
                del self._buf[:step]
                self._writer.write(self._enc().encode(chunk, final=False))
            return len(data)
        # encode all complete shards, keep the remainder buffered.  The
        # streaming path always byte-syncs between shards so every write to
        # the underlying writer is a valid byte-aligned prefix.
        while len(self._buf) > self._opts.shard_len:
            self._encode_shard(self._opts.shard_len, final=False, sync=True)
        return len(data)

    def _encode_shard(self, n: int, final: bool, sync: bool) -> None:
        chunk = bytes(self._buf[:n])
        del self._buf[:n]
        sink = BitSink()
        if not chunk and not final:
            # bare flush: just the byte-sync marker (deflate.zig:335-337)
            write_flush_marker(sink)
            self._writer.write(sink.getvalue())
            return
        if self._mode == "store":
            write_stored(sink, chunk, final)
        elif self._mode == "huffman":
            write_huffman_only(sink, chunk, final)
        else:
            ctx = np.frombuffer(self._context, dtype=np.uint8) \
                if (self._opts.context and self._context) else None
            toks = tokenize_shard(np.frombuffer(chunk, dtype=np.uint8),
                                  ctx, self._opts.level)
            write_block(sink, toks, final=final, raw=chunk)
        if sync and not final:
            write_flush_marker(sink)
        # shard outputs are byte-aligned thanks to the sync marker (or the
        # implicit final alignment), so plain byte append is exact
        if final:
            sink.align_to_byte()
        self._writer.write(sink.getvalue())
        # accumulate (don't replace): sub-32K writes must extend history so
        # cross-chunk matches keep the full MAX_DISTANCE window
        self._context = (self._context + chunk)[-consts.MAX_DISTANCE:]

    def flush(self) -> None:
        """Byte-sync everything buffered so far (network-protocol flush)."""
        assert not self._finished, "flush after finish"
        if self._device_active():
            if self._buf:
                chunk = bytes(self._buf)
                self._buf.clear()
                self._writer.write(self._enc().encode(chunk, final=False))
            else:
                sink = BitSink()
                write_flush_marker(sink)
                self._writer.write(sink.getvalue())
            return
        self._encode_shard(len(self._buf), final=False, sync=True)

    def finish(self) -> None:
        """Emit the final block and the container footer."""
        assert not self._finished, "double finish"
        if self._device_active():
            chunk = bytes(self._buf)
            self._buf.clear()
            self._writer.write(self._enc().encode(chunk, final=True))
        else:
            self._encode_shard(len(self._buf), final=True, sync=False)
        self._writer.write(write_footer(self._container, self._hasher))
        self._finished = True

    def reset(self) -> None:
        """Start a fresh stream (new member) on the same writer."""
        self._start()

    def set_writer(self, writer) -> None:
        """Swap the output sink mid-stream (deflate.zig:351-354)."""
        self._writer = writer

    def close(self) -> None:
        if not self._finished:
            self.finish()


class Decompressor:
    """Streaming decompressor: read()/reset()/set_reader().

    Pull-based like the reference's Inflate iterator (inflate.zig:315-336
    + CircularBuffer.zig): with the native decoder present, `read(n)`
    decodes incrementally through a resumable 64K-history stream, so
    decoded memory is O(64K) regardless of member size.  A file-like
    source is consumed INCREMENTALLY — compressed bytes are pulled in
    FETCH-sized chunks and the consumed prefix is dropped past TRIM, so
    input memory is O(TRIM) regardless of file size (the reference
    streams from any reader: inflate.zig:340-353).  reset() continues
    with the next concatenated stream in the same source.
    """

    CHUNK = 1 << 16
    FETCH = 1 << 20              # reader pull granularity
    TRIM = 1 << 22               # drop consumed prefix beyond this

    def __init__(self, reader, container: Container = Container.RAW,
                 verify: bool = True, dictionary: Optional[bytes] = None):
        self._container = container
        self._verify = verify
        self._dictionary = dictionary
        if isinstance(reader, (bytes, bytearray, memoryview)):
            self._src = None
            self._data = bytes(reader)
            self._eof = True
        else:
            self._src = reader
            self._data = b""
            self._eof = False
        self._pos = 0
        # whole-member fallback state (no native library)
        self._out: Optional[bytes] = None
        self._out_pos = 0
        # streaming state
        self._stream = None
        self._hasher: Optional[Hasher] = None
        self._member_done = False

    # -- incremental input ------------------------------------------------
    def _fetch(self, trim: bool = True) -> bool:
        """Pull one chunk from the source; False at EOF."""
        if self._eof:
            return False
        chunk = self._src.read(self.FETCH)
        if not chunk:
            self._eof = True
            return False
        if trim:
            # never trim once end_bit is latched (footer parse):
            # rebase shifts the cursor but not the latched end_bit
            self._trim()
        self._data = self._data + chunk
        if self._stream is not None and not self._member_done:
            # re-wrap: the stream must see the extended buffer
            self._stream.rebase(self._data, 0)
        return True

    def _trim(self) -> None:
        """Drop the consumed window prefix to bound input memory."""
        if self._stream is not None and not self._member_done:
            drop = self._stream.in_pos
        else:
            drop = self._pos
        if drop >= self.TRIM:
            self._data = self._data[drop:]
            self._pos = max(0, self._pos - drop)
            if self._stream is not None and not self._member_done:
                self._stream.rebase(self._data, drop)

    def _stream_read(self, n: int) -> bytes:
        """stream.read with fetch-retry at resumable input exhaustion."""
        while True:
            chunk = self._stream.read(n, more_input=not self._eof)
            if chunk or not self._stream.need_input:
                return chunk
            if not self._fetch():
                # true EOF: final attempt errors on genuine truncation
                return self._stream.read(n, more_input=False)

    def _start_member(self) -> bool:
        """Open a streaming decode of the member at self._pos.
        Returns False if the native streaming decoder is unavailable."""
        from . import native
        from .containers import parse_header
        from .errors import EndOfStream
        if not native.inflate_available():
            return False
        while True:
            try:
                hdr, _meta = parse_header(
                    self._container, self._data[self._pos:],
                    allow_dict=self._dictionary is not None)
                break
            except EndOfStream:
                if not self._fetch():
                    raise
        self._stream = native.InflateStream(
            self._data, (self._pos + hdr) * 8, self._dictionary)
        self._hasher = Hasher(self._container)
        self._member_done = False
        return True

    def _finish_member(self) -> None:
        """Advance past the footer, verifying checksums."""
        from .containers import parse_footer
        from .errors import EndOfStream
        end_byte = (self._stream.end_bit + 7) // 8
        if self._container is not Container.RAW:
            if self._verify:
                while True:
                    try:
                        consumed = parse_footer(
                            self._container, self._data[end_byte:],
                            self._hasher)
                        break
                    except EndOfStream:
                        if not self._fetch(trim=False):
                            raise
            else:
                consumed = self._container.footer_size
                while len(self._data) < end_byte + consumed:
                    if not self._fetch(trim=False):
                        raise EndOfStream()
            end_byte += consumed
        self._pos = end_byte
        self._member_done = True

    def read(self, n: int = -1) -> bytes:
        from . import native
        if self._out is not None or self._stream is not None:
            pass
        elif not native.inflate_available():
            # fallback: whole-member decode via the spec path (requires
            # the complete member; a reader source is slurped)
            while self._fetch(trim=False):
                pass
            self._out, self._pos = decompress_member(
                self._data, self._pos, self._container, self._verify,
                self._dictionary)
            self._out_pos = 0
        else:
            self._start_member()
        if self._out is not None:
            if n < 0:
                n = len(self._out) - self._out_pos
            chunk = self._out[self._out_pos:self._out_pos + n]
            self._out_pos += len(chunk)
            return chunk
        if self._member_done:
            return b""
        if n < 0:
            parts = []
            while True:
                c = self._stream_read(self.CHUNK)
                if not c:
                    break
                if self._verify:
                    self._hasher.update(c)
                else:
                    self._hasher.nbytes += len(c)
                parts.append(c)
            self._finish_member()
            return b"".join(parts)
        chunk = self._stream_read(n)
        if self._verify:
            self._hasher.update(chunk)
        else:
            self._hasher.nbytes += len(chunk)
        if self._stream.done and not chunk:
            # footer validated only after all payload was served, like the
            # reference's step() erroring on the call after the last drain
            self._finish_member()
        return chunk

    def read_all(self) -> bytes:
        return self.read(-1)

    def decompress(self, writer) -> None:
        """Stream the member to `writer` in bounded chunks."""
        while True:
            chunk = self.read(self.CHUNK)
            if not chunk:
                break
            writer.write(chunk)

    def reset(self) -> None:
        """Prepare for the next concatenated stream (inflate.zig:301-309)."""
        self._out = None
        self._out_pos = 0
        self._stream = None
        self._hasher = None
        self._member_done = False

    def at_end(self) -> bool:
        while self._pos >= len(self._data) and self._fetch():
            pass
        return self._pos >= len(self._data)

    def set_reader(self, reader) -> None:
        """Resume with additional input (inflate.zig:283); works
        mid-member — the active stream's cursor is rebased in place.
        A file-like argument becomes the new pull source; bytes are
        appended to the window directly."""
        if not isinstance(reader, (bytes, bytearray, memoryview)):
            self._src = reader
            self._eof = False
            return
        dropped = self._pos
        self._data = self._data[self._pos:] + bytes(reader)
        self._pos = 0
        if self._stream is not None and not self._member_done:
            self._stream.rebase(self._data, dropped)


# ---------------------------------------------------------------------------
# One-shot helpers + container-specialized namespaces
# ---------------------------------------------------------------------------

def _device_default() -> bool:
    import os
    return os.environ.get("FLATE_TPU_DEVICE", "0") == "1"


def _compress_oneshot(data, writer, container: Container, level: int,
                      mode: str, meta: Optional[GzipMetadata],
                      opts: Optional[CompressOptions],
                      dictionary: Optional[bytes] = None,
                      device: Optional[bool] = None):
    from . import metrics
    if device is None:
        device = _device_default()
    reader = None
    if isinstance(data, (bytes, bytearray, memoryview)):
        raw = bytes(data)
    else:
        reader = data
    if reader is None and device and mode == "deflate":
        return _compress_oneshot_device(raw, writer, container, level,
                                        meta, opts, dictionary)
    out = io.BytesIO() if writer is None else writer
    nbytes = 0 if reader is not None else len(raw)
    with metrics.timed(f"{container.name.lower()}.compress", nbytes,
                       level=level, mode=mode) as m:
        if mode == "deflate":
            c = Compressor(out, container, level=level, meta=meta,
                           opts=opts, dictionary=dictionary, device=device)
        elif mode == "huffman":
            c = Compressor.huffman_only(out, container, meta=meta)
        else:
            c = Compressor.store_only(out, container, meta=meta)
        if reader is None:
            c.write(raw)
        else:
            # O(chunk) input memory — the reference's only input I/O
            # point is a shard-sized read (deflate.zig:304-321, :313);
            # the device path pulls a whole dispatch batch per read
            step = (c._opts.batch * c._opts.shard_len
                    if c._device_active() else c._opts.shard_len)
            while True:
                chunk = reader.read(step)
                if not chunk:
                    break
                c.write(chunk)
        c.finish()
        if writer is None:
            blob = out.getvalue()
            m["bytes_out"] = len(blob)
            return blob
    return None


def _compress_oneshot_device(raw: bytes, writer, container: Container,
                             level: int, meta, opts, dictionary):
    """One-shot through the v2 device pipeline (jx.pipeline2).

    The plain case goes straight to compress_device2 — the production
    path with the FLT1 shard index, device checksums, and pipelined
    batch dispatch.  meta/dictionary members stream through the device
    Compressor (compress_device2 writes its own header/index)."""
    from .jx.pipeline2 import CTX, compress_device2
    o = opts or CompressOptions(level=level)
    if meta is None and dictionary is None:
        blob = compress_device2(
            raw, level=level, container=container,
            shard_len=o.shard_len, ctx=o.ctx or CTX, batch=o.batch,
            interpret=o.interpret)
        if writer is None:
            return blob
        writer.write(blob)
        return None
    out = io.BytesIO() if writer is None else writer
    c = Compressor(out, container, level=level, meta=meta, opts=o,
                   dictionary=dictionary, device=True)
    c.write(raw)
    c.finish()
    return out.getvalue() if writer is None else None


def _decompress_oneshot(data, writer, container: Container,
                        verify: bool = True, dictionary=None,
                        device: Optional[bool] = None):
    from . import metrics
    if device is None:
        device = _device_default()
    if device and dictionary is None and verify \
            and isinstance(data, (bytes, bytearray, memoryview)):
        # device shard-parallel decode of FLT1-indexed members
        # (jx.inflate2); members without an index fall through to the
        # host engine
        try:
            from .jx.inflate2 import decompress_device
            out = decompress_device(bytes(data), container)
            if writer is None:
                return out
            writer.write(out)
            return None
        except LookupError:
            pass
    if not isinstance(data, (bytes, bytearray, memoryview)) \
            and writer is not None:
        # reader -> writer: fully streaming, O(64K) decode state +
        # O(TRIM) input window (inflate.zig:340-353 parity)
        with metrics.timed(f"{container.name.lower()}.decompress", 0):
            d = Decompressor(data, container, verify, dictionary)
            while True:
                d.decompress(writer)
                if d.at_end():
                    break
                d.reset()
        return None
    raw = _to_bytes(data)
    with metrics.timed(f"{container.name.lower()}.decompress",
                       len(raw)) as m:
        if dictionary is not None:
            out, _ = decompress_member(raw, 0, container, verify,
                                       dictionary)
        else:
            from .inflate import decompress_multi
            out = decompress_multi(raw, container, verify)
        m["bytes_out"] = len(out)
    if writer is None:
        return out
    writer.write(out)
    return None


def _make_namespace(container: Container) -> SimpleNamespace:
    def compress(data, writer=None, level: int = consts.LEVEL_DEFAULT,
                 meta=None, opts=None, dictionary=None, device=None):
        """device=True routes through the v2 TPU pipeline
        (jx.pipeline2.compress_device2); device=None (default) consults
        FLATE_TPU_DEVICE=1.  Host path otherwise."""
        return _compress_oneshot(data, writer, container, level, "deflate",
                                 meta, opts, dictionary, device)

    def decompress(data, writer=None, verify: bool = True, dictionary=None,
                   device=None):
        """device=True decodes FLT1-indexed members shard-parallel on
        the TPU (jx.inflate2.decompress_device); device=None consults
        FLATE_TPU_DEVICE=1.  Unindexed input uses the host engine."""
        return _decompress_oneshot(data, writer, container, verify,
                                   dictionary, device)

    def compressor(writer, level: int = consts.LEVEL_DEFAULT, meta=None,
                   opts=None, dictionary=None, device: bool = False):
        return Compressor(writer, container, level=level, meta=meta,
                          opts=opts, dictionary=dictionary, device=device)

    def decompressor(reader, verify: bool = True, dictionary=None):
        return Decompressor(reader, container, verify, dictionary)

    huffman = SimpleNamespace(
        compress=lambda data, writer=None, meta=None: _compress_oneshot(
            data, writer, container, 0, "huffman", meta, None),
        decompress=decompress,
        compressor=lambda writer, meta=None: Compressor.huffman_only(
            writer, container, meta=meta),
        decompressor=decompressor,
    )
    store = SimpleNamespace(
        compress=lambda data, writer=None, meta=None: _compress_oneshot(
            data, writer, container, 0, "store", meta, None),
        decompress=decompress,
        compressor=lambda writer, meta=None: Compressor.store_only(
            writer, container, meta=meta),
        decompressor=decompressor,
    )
    return SimpleNamespace(
        compress=compress, decompress=decompress,
        compressor=compressor, decompressor=decompressor,
        Compressor=Compressor, Decompressor=Decompressor,
        huffman=huffman, store=store, container=container,
    )


flate = _make_namespace(Container.RAW)
gzip = _make_namespace(Container.GZIP)
zlib_ns = _make_namespace(Container.ZLIB)
