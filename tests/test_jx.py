"""Device (jx) pipeline tests on the CPU backend with tiny static shapes.

The conftest forces JAX_PLATFORMS=cpu with an 8-device virtual mesh, so
these validate the exact code that runs on TPU, minus the hardware.
"""

import gzip as pygzip

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import flate_tpu as ft  # noqa: E402
from flate_tpu import consts, tables  # noqa: E402
from flate_tpu.jx import encode as enc  # noqa: E402
from flate_tpu.jx import match as mtc  # noqa: E402
from flate_tpu.jx import parse as prs  # noqa: E402
from flate_tpu.jx.pipeline import compress_device  # noqa: E402


def test_length_code_arithmetic_matches_tables():
    lengths = jnp.arange(3, 259, dtype=jnp.int32)
    codes = np.asarray(enc.length_code(lengths))
    want = tables.LENGTH_TO_CODE[np.arange(3, 259) - 3]
    np.testing.assert_array_equal(codes, want)
    ev, eb = enc.length_extra(lengths, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(eb),
                                  tables.LENGTH_EXTRA_BITS[want])
    np.testing.assert_array_equal(
        np.asarray(ev), np.arange(3, 259) - tables.LENGTH_BASE[want])


def test_dist_code_arithmetic_matches_tables():
    dists = jnp.arange(1, consts.MAX_DISTANCE + 1, dtype=jnp.int32)
    codes = np.asarray(enc.dist_code(dists))
    want = tables.DIST_TO_CODE[np.arange(1, consts.MAX_DISTANCE + 1) - 1]
    np.testing.assert_array_equal(codes, want)
    ev, eb = enc.dist_extra(dists, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(eb), tables.DIST_EXTRA_BITS[want])
    np.testing.assert_array_equal(
        np.asarray(ev),
        np.arange(1, consts.MAX_DISTANCE + 1) - tables.DIST_BASE[want])


def _window(data: bytes, ctx: int) -> np.ndarray:
    return np.concatenate([np.zeros(ctx, np.uint8),
                           np.frombuffer(data, np.uint8)])


def test_device_matches_are_valid(rfc_text):
    """Every device-reported match must be byte-verified."""
    ctx = 1024
    data = rfc_text[:3072]
    w = _window(data, ctx)[None, :]
    mlen, mdist = mtc.find_matches_device(
        jnp.asarray(w), jnp.zeros(1, jnp.int32), K=8, K3=4, ctx=ctx)
    mlen = np.asarray(mlen)[0]
    mdist = np.asarray(mdist)[0]
    win = w[0]
    for i in np.flatnonzero(mlen >= 3):
        l, d = int(mlen[i]), int(mdist[i])
        assert np.array_equal(win[i:i + l], win[i - d:i - d + l]), \
            f"invalid match at {i} len {l} dist {d}"
        assert i - d >= ctx  # sources in unprimed context are forbidden
        assert i + l <= win.size


def test_device_parse_matches_spec(rfc_text):
    """Pointer-doubling parse equals the numpy spec parse."""
    from flate_tpu.deflate import lazy_parse
    ctx = 512
    data = rfc_text[:2048]
    w = _window(data, ctx)[None, :]
    mlen, mdist = mtc.find_matches_device(
        jnp.asarray(w), jnp.zeros(1, jnp.int32), K=8, K3=4, ctx=ctx)
    starts_dev = np.asarray(prs.parse_doubling(
        mlen, mdist, start=ctx, lazy=True, max_lazy=32))[0][ctx:]
    starts_np = lazy_parse(np.asarray(mlen)[0][ctx:],
                           np.asarray(mdist)[0][ctx:], True, 32)
    np.testing.assert_array_equal(starts_dev, starts_np)


@pytest.mark.parametrize("level", [1, 6])
def test_device_pipeline_roundtrip(rfc_text, level):
    data = rfc_text[:20000]
    blob = compress_device(data, level=level, shard_len=4096, ctx=4096,
                           batch=2)
    assert ft.gzip.decompress(blob) == data
    assert pygzip.decompress(blob) == data


def test_device_pipeline_incompressible():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 10000, dtype=np.uint8).tobytes()
    blob = compress_device(data, level=6, shard_len=4096, ctx=4096, batch=2)
    assert ft.gzip.decompress(blob) == data
    assert len(blob) <= len(data) + 200  # stored fallback bounds expansion


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    words, tbits, kind = fn(*args)
    assert (np.asarray(tbits) > 0).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
