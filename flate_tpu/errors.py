"""Error taxonomy mirroring the reference's strict error sets.

Reference error sets: /root/reference/src/flate/container.zig:45-51,
inflate.zig:72-78, huffman_decoder.zig:35-40.  Every malformed-stream test in
tests/data/fuzz asserts one of these exact classes.
"""


class FlateError(Exception):
    """Base class for all flate_tpu protocol errors."""


class EndOfStream(FlateError):
    """Input ended mid-stream."""


# --- container (container.zig:45-51) ---

class BadGzipHeader(FlateError):
    pass


class BadZlibHeader(FlateError):
    pass


class WrongGzipChecksum(FlateError):
    pass


class WrongGzipSize(FlateError):
    pass


class WrongZlibChecksum(FlateError):
    pass


# --- inflate (inflate.zig:72-78) ---

class InvalidCode(FlateError):
    pass


class InvalidMatch(FlateError):
    pass


class InvalidBlockType(FlateError):
    pass


class WrongStoredBlockNlen(FlateError):
    pass


class InvalidDynamicBlockHeader(FlateError):
    pass


# --- huffman decoder (huffman_decoder.zig:35-40) ---

class OversubscribedHuffmanTree(FlateError):
    pass


class IncompleteHuffmanTree(FlateError):
    pass


class MissingEndOfBlockCode(FlateError):
    pass


# --- bit writer invariant (bit_writer.zig:89) ---

class UnfinishedBits(FlateError):
    pass
