"""Native (C) host components, loaded via ctypes with transparent build.

The TPU does the heavy compute; these cover the host planning path where
Python-loop costs would otherwise bottleneck multi-GB/s pipelines:

- fasthuff: Huffman code-length construction (two-queue + package-merge)

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
_LIB = None
_TRIED = False


def _build() -> pathlib.Path | None:
    src = _DIR / "fasthuff.c"
    so = _DIR / "fasthuff.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=120)
            return so
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.huff_lengths.restype = ctypes.c_int
        lib.huff_lengths.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def huff_lengths(freq: np.ndarray, max_bits: int) -> np.ndarray | None:
    """Native Huffman code lengths, or None if the library is unavailable."""
    lib = _load()
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
