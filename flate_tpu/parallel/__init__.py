"""Multi-chip / multi-host scaling (pigz-style data parallelism).

The reference is single-threaded; scaling here follows SURVEY §2.4: the
input splits into independent 128 KiB shards compressed data-parallel
across a jax.sharding.Mesh, with

  (a) static shard->device placement (batch-axis sharding),
  (b) per-shard compressed bit-lengths all-gathered for the ordered
      bitstream splice,
  (c) CRC32/Adler32 combined across shards with the GF(2)/modular combine
      operators (flate_tpu.checksums) instead of a serial rolling hash.
"""

from .pigz import combined_crc32, compress_mesh, make_mesh  # noqa: F401
