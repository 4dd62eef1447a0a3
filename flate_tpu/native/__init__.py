"""Native (C) host components, loaded via ctypes with transparent build.

The TPU does the heavy compute; these cover the host paths where
Python-loop costs would otherwise bottleneck multi-GB/s pipelines:

- fasthuff:    Huffman code-length construction (two-queue + package-merge)
- fastinflate: DEFLATE decoder, semantics bit-exact with the Python spec
               decoder incl. the strict error taxonomy

Build happens on first import (cc -O2 -shared) and is cached next to the
source; every native function has a pure-Python/numpy fallback so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_LIBS: dict = {}


def _build(name: str) -> pathlib.Path | None:
    src = _DIR / f"{name}.c"
    so = _DIR / f"{name}.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-fPIC", "-shared", str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=120)
            return so
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load(name: str):
    if name in _LIBS:
        return _LIBS[name]
    _LIBS[name] = None
    so = _build(name)
    if so is not None:
        try:
            lib = ctypes.CDLL(str(so))
            if name == "fasthuff":
                lib.huff_lengths.restype = ctypes.c_int
                lib.huff_lengths.argtypes = [
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
            elif name == "fastinflate":
                lib.inflate_raw.restype = ctypes.c_int
                lib.inflate_raw.argtypes = [
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
                    ctypes.c_size_t, ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
                    ctypes.POINTER(ctypes.c_size_t)]
                lib.inflate_stream_state_size.restype = ctypes.c_size_t
                lib.inflate_stream_state_size.argtypes = []
                lib.inflate_stream_init.restype = None
                lib.inflate_stream_init.argtypes = [
                    ctypes.c_void_p, ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t]
                lib.inflate_stream_read.restype = ctypes.c_int
                lib.inflate_stream_read.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_size_t, ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
                lib.inflate_stream_read2.restype = ctypes.c_int
                lib.inflate_stream_read2.argtypes = [
                    ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_size_t, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
                lib.inflate_stream_in_pos.restype = ctypes.c_size_t
                lib.inflate_stream_in_pos.argtypes = [ctypes.c_void_p]
                lib.inflate_stream_end_bit.restype = ctypes.c_size_t
                lib.inflate_stream_end_bit.argtypes = [ctypes.c_void_p]
                lib.inflate_stream_done.restype = ctypes.c_int
                lib.inflate_stream_done.argtypes = [ctypes.c_void_p]
                lib.inflate_stream_rebase.restype = None
                lib.inflate_stream_rebase.argtypes = [
                    ctypes.c_void_p, ctypes.c_size_t]
                lib.scan_headers.restype = ctypes.c_long
                lib.scan_headers.argtypes = [
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
                    ctypes.c_size_t, ctypes.c_size_t,
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
            elif name == "fastcrc":
                lib.fast_crc32.restype = ctypes.c_uint32
                lib.fast_crc32.argtypes = [
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
                    ctypes.c_uint32]
                lib.fast_adler32.restype = ctypes.c_uint32
                lib.fast_adler32.argtypes = [
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t,
                    ctypes.c_uint32]
            elif name == "fastparse":
                lib.optimal_parse.restype = ctypes.c_int
                lib.optimal_parse.argtypes = [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_ubyte)]
            _LIBS[name] = lib
        except OSError:
            pass
    return _LIBS[name]


def huff_lengths(freq: np.ndarray, max_bits: int) -> np.ndarray | None:
    """Native Huffman code lengths, or None if the library is unavailable."""
    lib = _load("fasthuff")
    if lib is None:
        return None
    freq = np.ascontiguousarray(freq, dtype=np.int64)
    out = np.zeros(freq.size, dtype=np.uint8)
    rc = lib.huff_lengths(
        freq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        freq.size, max_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        return None
    return out.astype(np.int32)


# error-code -> exception class mapping for fastinflate
_INFLATE_ERRORS = {}


def _inflate_error(rc: int):
    global _INFLATE_ERRORS
    if not _INFLATE_ERRORS:
        from .. import errors as E
        _INFLATE_ERRORS = {
            1: E.EndOfStream, 2: E.InvalidCode, 3: E.InvalidMatch,
            4: E.InvalidBlockType, 5: E.WrongStoredBlockNlen,
            6: E.InvalidDynamicBlockHeader, 7: E.OversubscribedHuffmanTree,
            8: E.IncompleteHuffmanTree, 9: E.MissingEndOfBlockCode,
        }
    return _INFLATE_ERRORS[rc]


def inflate_available() -> bool:
    return _load("fastinflate") is not None


def crc32(data, value: int = 0) -> int | None:
    """PCLMUL-folded CRC32 (zlib convention) or None without the lib.

    `data` is any buffer exposing the C-contiguous buffer protocol."""
    lib = _load("fastcrc")
    if lib is None:
        return None
    buf = memoryview(data).cast("B")
    n = len(buf)
    # zero-copy: numpy wraps the buffer and hands out its address
    addr = np.frombuffer(buf, dtype=np.uint8) if n else np.empty(0, np.uint8)
    return int(lib.fast_crc32(
        addr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n,
        ctypes.c_uint32(value & 0xFFFFFFFF)))


def adler32(data, value: int = 1) -> int | None:
    """Blocked Adler32 (zlib convention) or None without the lib."""
    lib = _load("fastcrc")
    if lib is None:
        return None
    buf = memoryview(data).cast("B")
    n = len(buf)
    addr = np.frombuffer(buf, dtype=np.uint8) if n else np.empty(0, np.uint8)
    return int(lib.fast_adler32(
        addr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n,
        ctypes.c_uint32(value & 0xFFFFFFFF)))


_EXT = None
_EXT_TRIED = False


def _ext():
    """Build/load the CPython extension wrapper (zero-copy PyBytes
    output); None when no toolchain/headers — the ctypes path remains."""
    global _EXT, _EXT_TRIED
    if _EXT_TRIED:
        return _EXT
    _EXT_TRIED = True
    src = _DIR / "fastinflate_mod.c"
    so = _DIR / "fastinflate_mod.so"
    dep = _DIR / "fastinflate.c"
    try:
        if (not so.exists()
                or so.stat().st_mtime < src.stat().st_mtime
                or so.stat().st_mtime < dep.stat().st_mtime):
            import sysconfig
            inc = sysconfig.get_paths()["include"]
            ok = False
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-march=native", "-fPIC", "-shared",
                         f"-I{inc}", str(src), "-o", str(so)],
                        check=True, capture_output=True, timeout=120)
                    ok = True
                    break
                except (OSError, subprocess.SubprocessError):
                    continue
            if not ok:
                return None
        import importlib.machinery
        import importlib.util
        # name must match the PyInit_<name> symbol in the .so
        loader = importlib.machinery.ExtensionFileLoader(
            "fastinflate_mod", str(so))
        spec = importlib.util.spec_from_loader("fastinflate_mod", loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        _EXT = mod
    except Exception:
        _EXT = None
    return _EXT


def optimal_parse(mlen: np.ndarray, mdist: np.ndarray, data: np.ndarray,
                  lit_bits: np.ndarray, lenc_bits: np.ndarray,
                  dist_bits: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray] | None:
    """Cost-optimal token parse (zopfli-style squeeze) in C.

    Returns (take mask u8, selected length i32 per position) or None if
    the library is unavailable."""
    lib = _load("fastparse")
    if lib is None:
        return None
    n = mlen.size
    mlen = np.ascontiguousarray(mlen, dtype=np.int32)
    mdist = np.ascontiguousarray(mdist, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    lit_bits = np.ascontiguousarray(lit_bits, dtype=np.float32)
    lenc_bits = np.ascontiguousarray(lenc_bits, dtype=np.float32)
    dist_bits = np.ascontiguousarray(dist_bits, dtype=np.float32)
    sel = np.zeros(n, dtype=np.int32)
    take = np.zeros(n, dtype=np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    rc = lib.optimal_parse(
        mlen.ctypes.data_as(i32p), mdist.ctypes.data_as(i32p), n,
        data.ctypes.data_as(u8p), lit_bits.ctypes.data_as(f32p),
        lenc_bits.ctypes.data_as(f32p), dist_bits.ctypes.data_as(f32p),
        sel.ctypes.data_as(i32p), take.ctypes.data_as(u8p))
    if rc != 0:
        return None
    return take, sel


ERR_EOS = 1


def inflate_shard_into(data: bytes, start: int, length: int,
                       out: np.ndarray, out_off: int, want: int) -> bool:
    """Decode one independent indexed shard straight into out[out_off:
    out_off+want] with the one-shot fast loop (no 64K ring).

    Non-final shards end in a sync flush, not BFINAL, so the decoder
    runs off the end of the slice after producing all bytes — EndOfStream
    with a full output is the expected success shape there.  Returns
    False when the native lib is unavailable; raises the taxonomy error
    on malformed input."""
    lib = _load("fastinflate")
    if lib is None:
        return False
    src = np.frombuffer(data, dtype=np.uint8, count=length, offset=start)
    out_len = ctypes.c_size_t(0)
    end_bit = ctypes.c_size_t(0)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    dst = out[out_off:out_off + want]
    rc = lib.inflate_raw(
        src.ctypes.data_as(u8p), length, 0,
        dst.ctypes.data_as(u8p), want,
        ctypes.byref(out_len), ctypes.byref(end_bit))
    if out_len.value == want and rc in (0, ERR_EOS):
        return True
    if rc:
        raise _inflate_error(rc)()
    from ..errors import WrongGzipSize
    raise WrongGzipSize(f"shard produced {out_len.value} != {want}")


def inflate_raw(data: bytes, bit_pos: int = 0,
                dictionary: bytes | None = None,
                size_hint: int | None = None
                ) -> tuple[bytes, int] | None:
    """Native raw-deflate decode; returns (output, end_bit) or None if the
    library is unavailable.  Raises the exact flate_tpu.errors class on
    malformed input (same taxonomy as the Python spec decoder).

    size_hint (e.g. gzip ISIZE) sizes the output buffer exactly — the
    decoder grows and retries if it proves too small, so a wrong hint
    costs time, never correctness."""
    ext = _ext()
    if ext is not None:
        try:
            return ext.inflate_raw(
                data, bit_pos, dictionary,
                -1 if size_hint is None else max(0, int(size_hint)))
        except ValueError as e:
            msg = str(e)
            if msg.startswith("fastinflate:"):
                raise _inflate_error(int(msg.split(":")[1]))() from None
            raise
    lib = _load("fastinflate")
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)  # valid pointer; len passed as 0
    dict_len = len(dictionary) if dictionary else 0
    if size_hint is not None:
        # +290: the fast loop's copy-overrun headroom (see fastinflate.c)
        cap = max(1 << 12, dict_len + size_hint + 290)
    else:
        cap = max(1 << 16, dict_len + 4 * len(data) + (1 << 16))
    while True:
        out = np.empty(cap, dtype=np.uint8)
        if dict_len:
            out[:dict_len] = np.frombuffer(dictionary, dtype=np.uint8)
        out_len = ctypes.c_size_t(dict_len)
        end_bit = ctypes.c_size_t(0)
        rc = lib.inflate_raw(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            len(data), bit_pos,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            cap, ctypes.byref(out_len), ctypes.byref(end_bit))
        if rc == 0:
            return out[dict_len:out_len.value].tobytes(), int(end_bit.value)
        if rc == -1:
            cap = max(cap * 2, dict_len + 4 * len(data) + (1 << 16))
            continue
        raise _inflate_error(rc)()


class InflateStream:
    """Resumable bounded-memory raw-deflate decoder (native).

    Decodes one member with O(64K) state regardless of output size:
    history lives in a private ring inside the C state, and `read(n)`
    returns at most n decoded bytes, suspending mid-block/mid-match.
    Mirrors the reference's pull-based engine (inflate.zig:315-336 +
    CircularBuffer.zig).  Raises the exact flate_tpu.errors taxonomy.
    """

    def __init__(self, data: bytes, start_bit: int = 0,
                 dictionary: bytes | None = None):
        lib = _load("fastinflate")
        if lib is None:
            raise RuntimeError("native fastinflate unavailable")
        self._lib = lib
        self._data = np.frombuffer(data, dtype=np.uint8) if data \
            else np.zeros(1, dtype=np.uint8)
        self._data_len = len(data)
        self._state = ctypes.create_string_buffer(
            lib.inflate_stream_state_size())
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        if dictionary:
            d = np.frombuffer(dictionary, dtype=np.uint8)
            lib.inflate_stream_init(self._state, start_bit,
                                    d.ctypes.data_as(u8p), d.size)
        else:
            lib.inflate_stream_init(self._state, start_bit, None, 0)
        self._done = False
        self.need_input = False

    @property
    def done(self) -> bool:
        return self._done

    @property
    def end_bit(self) -> int:
        return int(self._lib.inflate_stream_end_bit(self._state))

    def read(self, n: int, more_input: bool = False) -> bytes:
        """Decode up to n more bytes; b'' iff the member is complete or
        (with more_input=True) the buffer ran dry at a resumable point —
        `need_input` distinguishes the two.  With more_input=True a
        truncated buffer never errors: the cursor rewinds to the last
        symbol boundary and the call repeats after the caller extends
        the buffer (zlib Z_BUF_ERROR discipline)."""
        self.need_input = False
        if self._done or n <= 0:
            return b""
        out = np.empty(n, dtype=np.uint8)
        written = ctypes.c_size_t(0)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        rc = self._lib.inflate_stream_read2(
            self._state, self._data.ctypes.data_as(u8p), self._data_len,
            1 if more_input else 0,
            out.ctypes.data_as(u8p), n, ctypes.byref(written))
        if rc == 0:
            self._done = True
        elif rc == -3:
            self.need_input = True
        elif rc != -2:
            raise _inflate_error(rc)()
        return out[:written.value].tobytes()

    @property
    def in_pos(self) -> int:
        """Resume-point byte offset in the member buffer: bytes before
        it are never re-read, so the caller may drop + rebase them."""
        return int(self._lib.inflate_stream_in_pos(self._state))

    def rebase(self, data: bytes, dropped: int) -> None:
        """Swap the member buffer after `dropped` front bytes were cut
        (Decompressor.set_reader support)."""
        self._lib.inflate_stream_rebase(self._state, dropped)
        self._data = np.frombuffer(data, dtype=np.uint8) if data \
            else np.zeros(1, dtype=np.uint8)
        self._data_len = len(data)


def scan_headers(data: bytes, start_bit: int = 0,
                 end_bit: int | None = None,
                 max_out: int = 64) -> list[int] | None:
    """Bit offsets of validated dynamic-block headers in [start_bit,
    end_bit) — chunk entry points for parallel decode of arbitrary
    streams.  Returns None if the native library is unavailable."""
    lib = _load("fastinflate")
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    if src.size == 0:
        return []
    if end_bit is None:
        end_bit = 8 * len(data)
    out = np.zeros(max_out, dtype=np.uint64)
    n = lib.scan_headers(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(data),
        start_bit, end_bit,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), max_out)
    return [int(x) for x in out[:min(n, max_out)]]
