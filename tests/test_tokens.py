"""Token-level regression tests (VERDICT r2 item 7).

The reference pins expected token sequences and per-level token counts
with a fake block writer (reference deflate.zig:533-575, 610-719).  Here
the produced bitstream itself is the witness: a token walker re-parses
the deflate stream and the tests pin exact (blocks, literals, matches,
match_bytes) per level for a fixed corpus, through BOTH the host engine
and the device (interpret-mode) pipeline — a matcher or parse regression
that trades tokens at equal compressed size now fails loudly.

When a deliberate matcher/parse improvement changes these numbers,
re-pin them ONLY after checking the compressed-size ladder did not
regress (tests/test_sizes.py, tests/test_device_sizes.py).
"""
import numpy as np
import pytest

import flate_tpu as ft
from flate_tpu import consts, tables
from flate_tpu import inflate as inf


def stream_tokens(raw: bytes):
    """Walk a raw deflate stream; return per-stream token statistics."""
    bits = inf._BitCursor(raw)
    out = bytearray()
    stats = {"blocks": 0, "stored_blocks": 0, "literals": 0,
             "matches": 0, "match_bytes": 0}
    while True:
        final = bits.read(1)
        btype = bits.read(2)
        stats["blocks"] += 1
        if btype == 0:
            bits.align_to_byte()
            ln = bits.read(16)
            nlen = bits.read(16)
            assert ln == (~nlen & 0xFFFF)
            out += bits.read_bytes(ln)
            stats["stored_blocks"] += 1
            if final:
                break
            continue
        if btype == 1:
            ll_table, d_table = inf.fixed_tables()
        else:
            ll_table, d_table = inf._decode_dynamic_header(bits)
        ll_sym, ll_bits = ll_table
        d_sym, d_bits = d_table
        while True:
            code = bits.peek(15)
            s = int(ll_sym[code])
            bits.consume(int(ll_bits[code]))
            if s < 256:
                out.append(s)
                stats["literals"] += 1
            elif s == 256:
                break
            else:
                li = s - 257
                length = int(tables.LENGTH_BASE[li]) + bits.read(
                    int(tables.LENGTH_EXTRA_BITS[li]))
                dcode = bits.peek(15)
                ds = int(d_sym[dcode])
                bits.consume(int(d_bits[dcode]))
                dist = int(tables.DIST_BASE[ds]) + bits.read(
                    int(tables.DIST_EXTRA_BITS[ds]))
                start = len(out) - dist
                for i in range(length):
                    out.append(out[start + i])
                stats["matches"] += 1
                stats["match_bytes"] += length
        if final:
            break
    return stats, bytes(out)


def _corpus():
    with open("tests/data/rfc1951.txt", "rb") as fh:
        return fh.read()[:32 * 1024]


# ---------------------------------------------------------------------------
# pinned per-level token counts — regenerate ONLY after a size-ladder check
# ---------------------------------------------------------------------------

HOST_EXPECT = {
    1: {'blocks': 1, 'stored_blocks': 0, 'literals': 2147,
        'matches': 4065, 'match_bytes': 30621},
    2: {'blocks': 1, 'stored_blocks': 0, 'literals': 2128,
        'matches': 3908, 'match_bytes': 30640},
    4: {'blocks': 1, 'stored_blocks': 0, 'literals': 2929,
        'matches': 3267, 'match_bytes': 29839},
    6: {'blocks': 1, 'stored_blocks': 0, 'literals': 3025,
        'matches': 3089, 'match_bytes': 29743},
    9: {'blocks': 1, 'stored_blocks': 0, 'literals': 3033,
        'matches': 3064, 'match_bytes': 29735},
}
# device streams end with an empty stored block (sync marker / BFINAL
# carrier) per shard — hence 2 stored blocks for this 2-shard corpus
DEVICE_EXPECT = {
    # re-pinned for the entropy DP cost model (squeeze levels 4-9;
    # size delta vs exact package-merge costs: +0.1%/+0.003% on the
    # 2 MiB text/mixed corpora — scratch/entropy_size.py)
    1: {'blocks': 4, 'stored_blocks': 2, 'literals': 3859,
        'matches': 4023, 'match_bytes': 28909},
    4: {'blocks': 4, 'stored_blocks': 2, 'literals': 4025,
        'matches': 3110, 'match_bytes': 28743},
    6: {'blocks': 4, 'stored_blocks': 2, 'literals': 4096,
        'matches': 2851, 'match_bytes': 28672},
    9: {'blocks': 4, 'stored_blocks': 2, 'literals': 3034,
        'matches': 3152, 'match_bytes': 29734},
}


def test_walker_roundtrips():
    data = _corpus()
    raw = ft.flate.compress(data, level=6)
    stats, out = stream_tokens(raw)
    assert out == data
    # every input byte is produced by exactly one literal or match byte
    assert stats["literals"] + stats["match_bytes"] == len(data)


@pytest.mark.parametrize("level", sorted(HOST_EXPECT))
def test_host_token_counts(level):
    data = _corpus()
    raw = ft.flate.compress(data, level=level)
    stats, out = stream_tokens(raw)
    assert out == data
    assert stats == HOST_EXPECT[level], (
        f"host level {level}: token stats changed {stats}; re-pin only "
        "after verifying the size ladder did not regress")


@pytest.mark.parametrize("level", sorted(DEVICE_EXPECT))
def test_device_token_counts(level):
    from flate_tpu.jx import pipeline2 as pp
    from flate_tpu.containers import Container
    data = _corpus()
    raw = pp.compress_device2(data, level=level, container=Container.RAW,
                              shard_len=16384, ctx=8192, batch=2,
                              interpret=True)
    stats, out = stream_tokens(raw)
    assert out == data
    assert stats == DEVICE_EXPECT[level], (
        f"device level {level}: token stats changed {stats}; re-pin only "
        "after verifying the size ladder did not regress")
