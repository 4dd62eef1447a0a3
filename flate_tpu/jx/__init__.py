"""flate_tpu.jx — the JAX/XLA/Pallas device pipeline.

Everything in this package is jit-compatible and shard-batched.  The numpy
modules at the package root are the specification; these mirror them with
TPU-native formulations:

- match.py   gather-free LZ77 match search (sort-carried window bytes)
- parse.py   lazy/greedy token parse (pointer doubling + Pallas walk)
- encode.py  histograms, code assignment, vectorized bit-pack
- pipeline.py  end-to-end jitted compress over batches of shards
"""

import os as _os
import pathlib as _pathlib

import jax as _jax

# Persistent compilation cache: compiles through the TPU tunnel are slow
# (minutes); cache them next to the package so repeated runs (and the
# bench driver) start hot.
_cache_dir = _os.environ.get(
    "FLATE_TPU_CACHE",
    str(_pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

from . import match, parse, encode, pipeline  # noqa: F401, E402
