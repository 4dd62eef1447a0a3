"""Pallas pack kernel vs the numpy reference packer (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from flate_tpu.bitpack import pack_bits_np
from flate_tpu.jx import pack


def test_pack_fields_matches_reference():
    rng = np.random.default_rng(0)
    B, SLOTS = 3, 4096
    bits = rng.integers(0, 29, (B, SLOTS)).astype(np.int32)
    bits[:, ::7] = 0                         # interleave dead fields
    vals = rng.integers(0, 1 << 28, (B, SLOTS)).astype(np.uint32)
    vals &= (np.uint32(1) << bits.astype(np.uint32)) - 1
    vals[bits == 0] = 0
    nwr = (SLOTS * 28 // 32) // 128 + 3
    words, tbits = pack.pack_fields(jnp.asarray(vals), jnp.asarray(bits),
                                    nwr, interpret=True)
    words, tbits = np.asarray(words), np.asarray(tbits)
    for b in range(B):
        live = bits[b] > 0
        ref, total = pack_bits_np(vals[b][live].astype(np.uint64),
                                  bits[b][live])
        assert int(tbits[b]) == total
        got = words[b].reshape(-1)
        n = (total + 31) // 32
        assert np.array_equal(got[:n], ref[:n]), b
        assert not got[n:].any()


def test_pack_fields_empty_and_full_width():
    B, SLOTS = 1, 256
    bits = np.zeros((B, SLOTS), np.int32)
    vals = np.zeros((B, SLOTS), np.uint32)
    bits[0, 0] = 28
    vals[0, 0] = (1 << 28) - 1
    bits[0, 255] = 1
    vals[0, 255] = 1
    words, tbits = pack.pack_fields(jnp.asarray(vals), jnp.asarray(bits),
                                    4, interpret=True)
    ref, total = pack_bits_np(
        np.asarray([(1 << 28) - 1, 1], np.uint64),
        np.asarray([28, 1], np.int64))
    assert int(tbits[0]) == total == 29
    assert np.array_equal(np.asarray(words)[0].reshape(-1)[:1], ref[:1])
