"""flate_tpu — a TPU-native DEFLATE (gzip/zlib/raw) compression framework.

Brand-new JAX/XLA/Pallas design with the capability set of the Zig reference
library ianic/flate (see SURVEY.md): compression levels 1-9 plus store and
huffman-only modes, parallel LZ77 match search with lazy arbitration,
stored/fixed/dynamic block selection with canonical Huffman coding,
strict-error inflate, CRC32/Adler32 container framing, streaming
compress/flush/finish/reset, and pigz-style data-parallel scaling over TPU
meshes (flate_tpu.parallel).

Public surface (readme.md:100-125 parity):

    flate_tpu.flate / .gzip / .zlib   — per-container namespaces, each with
        compress, decompress, compressor, decompressor,
        Compressor, Decompressor, huffman.*, store.*
"""

from . import checksums, consts, errors, metrics, tables
from .api import Compressor, Decompressor, flate, gzip, zlib_ns as zlib
from .containers import Container, GzipMetadata
from .deflate import CompressOptions

__version__ = "0.1.0"

__all__ = [
    "flate", "gzip", "zlib", "Compressor", "Decompressor",
    "Container", "GzipMetadata", "CompressOptions",
    "checksums", "consts", "errors", "metrics", "tables",
]
