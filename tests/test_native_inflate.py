"""Native C decoder vs the Python spec decoder: full differential parity.

The default decode path dispatches to flate_tpu/native/fastinflate.c; the
fuzz corpus + these tests pin that the two implementations agree on every
byte, every end position, and every error class.
"""

import zlib as pyzlib

import numpy as np
import pytest

from flate_tpu import errors, native
from flate_tpu.inflate import inflate_raw_py

pytestmark = pytest.mark.skipif(not native.inflate_available(),
                                reason="native inflate not built")


def _both(data: bytes):
    try:
        py = inflate_raw_py(data)
    except errors.FlateError as e:
        py = type(e)
    try:
        nat = native.inflate_raw(data)
    except errors.FlateError as e:
        nat = type(e)
    return py, nat


def test_fuzz_corpus_differential(fuzz_dir):
    for f in sorted(fuzz_dir.glob("*.input")):
        py, nat = _both(f.read_bytes())
        assert py == nat, f.name


def test_random_garbage_differential():
    rng = np.random.default_rng(123)
    for _ in range(300):
        n = int(rng.integers(1, 300))
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        py, nat = _both(data)
        assert py == nat, data.hex()


def test_truncated_valid_streams_differential(rfc_text):
    co = pyzlib.compressobj(6, pyzlib.DEFLATED, -15)
    stream = co.compress(rfc_text) + co.flush()
    rng = np.random.default_rng(7)
    for cut in sorted(rng.integers(1, len(stream), 40).tolist()):
        py, nat = _both(stream[:cut])
        assert py == nat, f"cut={cut}"


def test_dictionary_native(rfc_text):
    d = rfc_text[:4096]
    co = pyzlib.compressobj(6, pyzlib.DEFLATED, -15, zdict=d)
    stream = co.compress(rfc_text[4096:20000]) + co.flush()
    out, _ = native.inflate_raw(stream, 0, d)
    assert out == rfc_text[4096:20000]


def test_large_overlap_matches_native():
    data = b"\x00" * 300000 + b"ab" * 100000
    co = pyzlib.compressobj(9, pyzlib.DEFLATED, -15)
    stream = co.compress(data) + co.flush()
    out, _ = native.inflate_raw(stream)
    assert out == data


def test_device_shard_long_literal_codes():
    """Regression: a device-produced shard whose dynamic table carries
    12-15 bit literal codes drove the fast loop's literal chain past its
    bit credit (nbits went negative -> UB refill shift -> corrupt
    output, InvalidBlockType mid-stream).  The fixture decodes clean
    under zlib and the spec decoder; the native one-shot must agree."""
    import pathlib
    import zlib

    from flate_tpu import native

    import numpy as np

    sh = (pathlib.Path(__file__).parent /
          "data" / "device_shard_longlit.bin").read_bytes()
    d = zlib.decompressobj(-15)
    want = d.decompress(sh)
    out = np.zeros(len(want), np.uint8)
    # sync-flush-terminated shard (no BFINAL): the shard-into API treats
    # end-of-slice with a full region as success
    assert native.inflate_shard_into(sh, 0, len(sh), out, 0, len(want))
    assert out.tobytes() == want
