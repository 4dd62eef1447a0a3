"""Golden block-writer fixtures as decode oracles.

The reference locks its encoder byte-for-byte against these fixtures
(src/flate/testdata/block_writer/, harness block_writer.zig:599-706).  Our
encoder is deliberately not byte-identical (better block choice is allowed),
so the fixtures serve as decode conformance + size budgets instead:

1. our inflate must decode every fixture exactly as zlib does;
2. where the original input exists, re-encoding it at level 9 must not
   exceed the fixture's size (the golden stream is the reference encoder's
   own output for that data).
"""

import zlib as pyzlib

import pytest

import flate_tpu as ft
from flate_tpu.inflate import inflate_raw


def _fixtures(block_writer_dir):
    return sorted(block_writer_dir.glob("*.expect*"))


def test_fixtures_present(block_writer_dir):
    assert len(_fixtures(block_writer_dir)) >= 40


def test_decode_matches_zlib_oracle(block_writer_dir):
    for f in _fixtures(block_writer_dir):
        raw = f.read_bytes()
        d = pyzlib.decompressobj(-15)
        want = d.decompress(raw)
        if not d.eof:
            continue  # fixture stream has no final block: skip strict decode
        got, _ = inflate_raw(raw)
        assert got == want, f.name


def test_reencode_within_fixture_budget(block_writer_dir):
    for f in sorted(block_writer_dir.glob("*.input")):
        data = f.read_bytes()
        base = f.name[:-len(".input")]
        golden = block_writer_dir / f"{base}.wb.expect"
        if not golden.exists():
            continue
        ours = len(ft.flate.compress(data, level=9))
        # fixture streams lack container framing; ours is raw too
        budget = len(golden.read_bytes())
        assert ours <= budget + 8, \
            f"{f.name}: ours {ours} vs golden {budget}"


def test_roundtrip_fixture_inputs(block_writer_dir):
    for f in sorted(block_writer_dir.glob("*.input")):
        data = f.read_bytes()
        for level in (1, 6, 9):
            blob = ft.flate.compress(data, level=level)
            assert ft.flate.decompress(blob) == data, f"{f.name} l{level}"
            assert pyzlib.decompressobj(-15).decompress(blob) == data
