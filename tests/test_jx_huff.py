"""Device Huffman planning (jx/huff.py) vs the host spec (huffman.py).

Package-merge and the host two-queue both produce OPTIMAL length-limited
codes; ties may assign different lengths, so the pins are:
- total coded size equality (optimality),
- Kraft completeness (strict decoders require it),
- length limit respected,
- canonical code assignment identical to tables.canonical_codes for the
  device-produced lengths.
"""

import numpy as np
import pytest

from flate_tpu import consts, huffman, tables
from flate_tpu.jx import huff


def _cases(n, rng):
    yield rng.integers(0, 1000, size=n).astype(np.int64)
    yield rng.integers(0, 5, size=n).astype(np.int64)          # sparse
    z = np.zeros(n, dtype=np.int64); z[3] = 7; yield z          # single
    yield np.zeros(n, dtype=np.int64)                           # none
    two = np.zeros(n, dtype=np.int64); two[0] = 1; two[n - 1] = 10**5
    yield two                                                   # two syms
    # skew that forces the length limit (near-Fibonacci)
    fib = np.zeros(n, dtype=np.int64)
    a, b = 1, 1
    for i in range(min(n, 30)):
        fib[i] = a
        a, b = b, a + b
    yield fib
    yield rng.geometric(0.02, size=n).astype(np.int64)          # heavy tail


@pytest.mark.parametrize("n,max_bits", [(286, 15), (30, 15), (19, 7)])
def test_pm_lengths_optimal_and_complete(n, max_bits):
    rng = np.random.default_rng(42)
    batch = list(_cases(n, rng))
    freq = np.stack(batch).astype(np.int32)
    lens = np.asarray(huff.pm_lengths(freq, max_bits))
    for b, f in enumerate(batch):
        ref = huffman.huffman_code_lengths(f, max_bits)
        got = lens[b]
        assert got.max() <= max_bits
        assert np.all((got > 0) == (f > 0))
        nact = int((f > 0).sum())
        if nact >= 2:
            kraft = np.sum(2.0 ** (-got[got > 0].astype(float)))
            assert kraft == 1.0, f"case {b}: not Kraft-complete"
        cost_got = int((f * got).sum())
        cost_ref = int((f * ref).sum())
        assert cost_got == cost_ref, \
            f"case {b}: device cost {cost_got} != host optimal {cost_ref}"


def test_canonical_codes_match_host():
    rng = np.random.default_rng(3)
    freq = np.stack([rng.integers(0, 500, 286) for _ in range(4)]
                    ).astype(np.int32)
    lens = np.asarray(huff.pm_lengths(freq, 15))
    codes = np.asarray(huff.canonical_codes_dev(lens, 15))
    for b in range(lens.shape[0]):
        host = tables.canonical_codes(lens[b])
        assert np.array_equal(codes[b], host.astype(np.uint32))


def test_packed_tables_roundtrip_decode():
    """Codes from the device planner must decode with the repo's own
    decode-table builder (completeness + prefix-freeness end to end)."""
    from flate_tpu.inflate import build_decode_table
    rng = np.random.default_rng(11)
    freq = rng.integers(1, 300, size=(1, 286)).astype(np.int32)
    lens = np.asarray(huff.pm_lengths(freq, 15))[0]
    build_decode_table(lens, consts.MAX_CODE_BITS, is_litlen=True)
