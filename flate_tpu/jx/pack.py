"""Pallas bit-pack kernel — MXU one-hot placement, zero host scatters.

Packs per-shard (value, nbits) field sequences (nbits <= 28) into the
LSB-first u32 word stream.  Round 1 used an XLA scatter-add (which
lowers to a serial loop on TPU, 5-15 ms per shard); here each group of
128 fields is placed with two small bf16 matmuls:

    tile(4 byte-planes, 256 words) = planes(v0) @ onehot(word)
                                   + planes(v1) @ onehot(word + 1)

Byte-plane sums are exact (disjoint bit ranges sum without carries, so
every plane value stays <= 255, exact in bf16 inputs / f32 accumulate),
and the combined u32 tile is accumulated into the output at a dynamic
sublane offset.  The running bit offset is carried serially across
groups inside the kernel, so no device-wide cumsum is needed.

Replaces bit_writer.zig / bitpack.pack_bits_np on the device path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRP = 128                        # fields per group
WIN = 256                        # placement window (words)


def _pack_kernel(vals_ref, bits_ref, out_ref, tbits_ref):
    G = vals_ref.shape[1]
    out_ref[...] = jnp.zeros_like(out_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GRP, WIN), 1)

    def body(g, carry):
        base = carry
        v = vals_ref[0, g, :].reshape(1, GRP).astype(jnp.uint32)
        bts = bits_ref[0, g, :].reshape(1, GRP)
        # in-group inclusive prefix sum of widths (log-step rolls)
        acc = bts
        for sh in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(acc, sh, 1)
            mask = jax.lax.broadcasted_iota(jnp.int32, (1, GRP), 1) >= sh
            acc = acc + jnp.where(mask, rolled, 0)
        gsum = acc[0, GRP - 1]
        off = base + acc - bts                        # exclusive offsets
        word = off >> 5
        aligned = word & ~jnp.int32(127)
        row0 = aligned[0, 0] >> 7
        wr = (word - aligned[0, 0]).reshape(GRP, 1)
        sh_ = (off & 31).astype(jnp.uint32).reshape(1, GRP)
        v0 = (v << sh_).reshape(GRP, 1)
        v1 = jnp.where(sh_ == 0, 0,
                       v >> ((jnp.uint32(32) - sh_) & jnp.uint32(31))
                       ).reshape(GRP, 1)
        oh0 = (lane == wr).astype(jnp.bfloat16)
        oh1 = (lane == wr + 1).astype(jnp.bfloat16)

        def planes(x):
            return jnp.concatenate(
                [((x >> (8 * p)) & 0xFF).astype(jnp.int32) for p in range(4)],
                axis=1).T.astype(jnp.bfloat16)        # (4, GRP)

        t = (jnp.dot(planes(v0), oh0, preferred_element_type=jnp.float32)
             + jnp.dot(planes(v1), oh1, preferred_element_type=jnp.float32))
        ti = t.astype(jnp.int32)                      # (4, WIN)
        word_row = (ti[0:1, :] | (ti[1:2, :] << 8) | (ti[2:3, :] << 16)
                    | (ti[3:4, :] << 24)).astype(jnp.uint32)
        w2 = word_row.reshape(2, 128)
        cur = out_ref[0, pl.ds(row0, 2), :]
        out_ref[0, pl.ds(row0, 2), :] = cur + w2
        return base + gsum

    total = jax.lax.fori_loop(0, G, body, jnp.int32(0))
    tbits_ref[0, 0, 0] = total


@functools.partial(jax.jit, static_argnames=("nwr", "interpret"))
def pack_fields(vals: jnp.ndarray, bits: jnp.ndarray, nwr: int,
                interpret: bool = False):
    """vals (B, SLOTS) u32 (dead fields zero), bits (B, SLOTS) i32.

    Returns (words (B, nwr, 128) u32, total_bits (B,) i32).  nwr * 128
    words must bound the worst-case stream (+1 row of slack for the
    final window)."""
    B, SLOTS = vals.shape
    assert SLOTS % GRP == 0
    G = SLOTS // GRP
    words, tbits = pl.pallas_call(
        _pack_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, G, GRP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, GRP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nwr, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nwr, 128), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(vals.reshape(B, G, GRP), bits.reshape(B, G, GRP))
    return words, tbits[:, 0, 0]
