"""flate_tpu.jx — the JAX/XLA/Pallas device pipeline.

Everything in this package is jit-compatible and shard-batched.  The numpy
modules at the package root are the specification; these mirror them with
TPU-native formulations:

- match.py   gather-free LZ77 match search (sort-carried window bytes)
- parse.py   lazy/greedy token parse (pointer doubling + Pallas walk)
- encode.py  histograms, code assignment, vectorized bit-pack
- pipeline.py  end-to-end jitted compress over batches of shards
"""

from . import match, parse, encode, pipeline  # noqa: F401
