"""Fused Pallas matcher (jx/match2.py) validity tests (CPU interpret mode).

The fused matcher's contract is soundness, not candidate-set parity with
the spec matcher: every reported (len, dist) must be a real byte-equal
back-reference within bounds.  Compression-size parity is pinned
separately by the device-path size tests.
"""

import numpy as np
import pytest

import jax

from flate_tpu import consts
from flate_tpu.jx import match2

CTX = 1024
SHARD = match2.TILE - CTX            # one tile per shard


def _mk_window(rng, B, kind="text"):
    rows = []
    for b in range(B):
        if kind == "text":
            words = [b"the quick ", b"brown fox ", b"jumps over", b"lazy dog. "]
            data = b"".join(words[rng.integers(0, 4)] for _ in range(
                match2.TILE // 10 + 2))[:match2.TILE]
        else:
            data = bytes(rng.integers(0, 256, match2.TILE, dtype=np.uint8))
        rows.append(np.frombuffer(data, dtype=np.uint8))
    return np.stack(rows)


def _check_valid(window, mlen, mdist, ctx_len, valid_len):
    B, W = window.shape
    for b in range(B):
        min_src = CTX - int(ctx_len[b])
        limit = CTX + int(valid_len[b])
        for p in np.nonzero(mlen[b])[0]:
            l, d = int(mlen[b, p]), int(mdist[b, p])
            assert consts.MIN_MATCH_LEN <= l <= consts.MAX_MATCH_LEN
            assert 1 <= d <= consts.MAX_DISTANCE
            src = p - d
            assert src >= min_src, (b, p, l, d)
            assert p + l <= limit, (b, p, l, d)
            assert np.array_equal(window[b, src:src + l],
                                  window[b, p:p + l]), (b, p, l, d)


@pytest.mark.parametrize("kind", ["text", "random"])
def test_fused_matcher_sound(kind):
    rng = np.random.default_rng(1)
    B = 2
    window = _mk_window(rng, B, kind)
    ctx_len = np.full(B, CTX, np.int32)
    ctx_len[0] = 0                      # row 0: unprimed context
    valid_len = np.full(B, SHARD, np.int32)
    mlen, mdist = match2.find_matches_fused(
        jax.numpy.asarray(window), jax.numpy.asarray(ctx_len),
        jax.numpy.asarray(valid_len), K=16, nw=4, ctx=CTX, interpret=True)
    mlen, mdist = np.asarray(mlen), np.asarray(mdist)
    _check_valid(window, mlen, mdist, ctx_len, valid_len)
    if kind == "text":
        # sanity: a text corpus must actually produce matches
        assert (mlen[:, CTX:] >= 3).mean() > 0.2


def test_fused_matcher_tail_shard():
    rng = np.random.default_rng(2)
    B = 2
    window = _mk_window(rng, B, "text")
    valid_len = np.asarray([SHARD, 1000], np.int32)
    window[1, CTX + 1000:] = 0          # zero padding beyond the tail
    ctx_len = np.full(B, CTX, np.int32)
    mlen, mdist = match2.find_matches_fused(
        jax.numpy.asarray(window), jax.numpy.asarray(ctx_len),
        jax.numpy.asarray(valid_len), K=16, nw=4, ctx=CTX, interpret=True)
    mlen, mdist = np.asarray(mlen), np.asarray(mdist)
    _check_valid(window, mlen, mdist, ctx_len, valid_len)
    # nothing may match beyond the tail
    assert not mlen[1, CTX + 1000:].any()


def test_fused_matcher_finds_long_runs():
    """Same-distance chain extension must recover full run lengths."""
    B = 1
    window = np.zeros((B, match2.TILE), np.uint8)
    pat = np.frombuffer(b"abcdefgh" * 64, dtype=np.uint8)  # 512-byte period-8
    window[0, CTX:CTX + 512] = pat
    window[0, CTX + 512:CTX + 1024] = pat
    ctx_len = np.zeros(B, np.int32)
    valid_len = np.full(B, SHARD, np.int32)
    mlen, mdist = match2.find_matches_fused(
        jax.numpy.asarray(window), jax.numpy.asarray(ctx_len),
        jax.numpy.asarray(valid_len), K=16, nw=4, ctx=CTX, interpret=True)
    mlen = np.asarray(mlen)
    assert mlen[0, CTX + 512] >= 256    # long continuation found


def test_fp_ranked_pass_is_valid(rfc_text):
    """The opt-in fingerprint-ranked scan (fp=True: exact carry split
    into 2 exact words + ranking fingerprints) must still produce only
    VALID matches — emitted lengths come from the exact words, so every
    (len, dist) must satisfy window[p-d:p-d+len] == window[p:p+len]."""
    import jax.numpy as jnp
    data = np.frombuffer(rfc_text[:8192], np.uint8)
    W = 8192
    window = jnp.asarray(data[None, :W])
    ctx_len = jnp.asarray([0], jnp.int32)
    valid = jnp.asarray([W], jnp.int32)
    mlen, mdist = match2.find_matches_fused(
        window, ctx_len, valid, K=8, nw=8, fp=True, interpret=True)
    ml = np.asarray(mlen)[0]
    md = np.asarray(mdist)[0]
    for p in np.nonzero(ml >= 3)[0][:500]:
        l, d = int(ml[p]), int(md[p])
        assert 1 <= d <= p
        got = bytes(data[p:p + l])
        # overlapping matches replicate the period
        want = bytes((data[p - d + (i % d)] for i in range(l)))
        assert got == want, (p, l, d)
