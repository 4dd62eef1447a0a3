"""Mutation-fuzz differential: spec vs native vs streaming decoder.

Complements the reference-corpus parity tests (test_inflate_fuzz.py)
with randomized mutations of valid streams; all three decoders must
agree on the error class or the output bytes.  The stdin CLI twin
(cli/decompress_cli.py) runs the same trio for external fuzzers.
"""
import random
import zlib

import pytest

from flate_tpu import errors, native
from flate_tpu import inflate as pyinf

pytestmark = pytest.mark.skipif(not native.inflate_available(),
                                reason="native decoder unavailable")


def _spec(d):
    try:
        return pyinf.inflate_raw_py(d)[0], None
    except errors.FlateError as e:
        return None, type(e).__name__


def _native(d):
    try:
        return native.inflate_raw(d)[0], None
    except errors.FlateError as e:
        return None, type(e).__name__


def _stream(d):
    try:
        st = native.InflateStream(d)
        parts = []
        while True:
            c = st.read(977)
            if not c:
                break
            parts.append(c)
        return b"".join(parts), None
    except errors.FlateError as e:
        return None, type(e).__name__


def test_mutation_fuzz_trio_agrees():
    rng = random.Random(20260817)
    base = b"the quick brown fox jumps over the lazy dog " * 40
    seeds = [zlib.compress(base, lv)[2:-4] for lv in (0, 1, 6, 9)]
    seeds.append(zlib.compress(bytes(range(256)) * 32, 6)[2:-4])
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    seeds.append(co.compress(base) + co.flush(zlib.Z_SYNC_FLUSH)
                 + co.flush())
    # device-encoder stream with segmented shards (stored/coded mix,
    # replicated headers, empty-stored trailer) — our own emission
    # shape must survive mutation fuzz like anyone else's
    from flate_tpu.containers import Container
    from flate_tpu.jx import pipeline2
    mixed = base + bytes(random.Random(3).randrange(256)
                         for _ in range(2048)) + base
    seeds.append(pipeline2.compress_device2(
        mixed, level=6, container=Container.RAW, shard_len=2048,
        ctx=1024, batch=2, interpret=True))
    for it in range(600):
        s = bytearray(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.5 and s:
                s[rng.randrange(len(s))] ^= 1 << rng.randrange(8)
            elif op < 0.75 and s:
                del s[rng.randrange(len(s))]
            else:
                s.insert(rng.randrange(len(s) + 1), rng.randrange(256))
        d = bytes(s)
        a, b, c = _spec(d), _native(d), _stream(d)
        assert a == b, f"native disagrees on mutation #{it}: {a[1]}/{b[1]}"
        assert a == c, f"stream disagrees on mutation #{it}: {a[1]}/{c[1]}"
