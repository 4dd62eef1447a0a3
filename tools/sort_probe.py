"""Chip probe: lax.sort cost vs operand count / element count / packing.

Informs the round-5 sort redesign (VERDICT r4 Next #2).  Run on the
real TPU: python tools/sort_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, W = 64, 163840  # production: batch 64 rows of (32K ctx + 128K shard)


def _sync(r):
    # one-element fetch per leaf: block_until_ready through the axon
    # tunnel does not force execution (STATUS r4)
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.reshape(-1)[:1])


def bench(fn, *args, n=5):
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
    ops = [jnp.asarray(rng.integers(0, 2**32, (B, W), dtype=np.uint32))
           for _ in range(8)]

    for nops in (1, 2, 3, 5, 9):
        f = jax.jit(lambda k, *o: jax.lax.sort([k, *o], dimension=1,
                                               num_keys=1))
        ms = bench(f, key, *ops[: nops - 1])
        print(f"sort {nops} ops u32 (B={B}, W={W}): {ms:.1f} ms")

    # u64 packing: 4 carry u32 pairs -> 2 u64 operands?
    try:
        k64 = key.astype(jnp.uint64)
        f = jax.jit(lambda k, a, b: jax.lax.sort(
            [k, a, b], dimension=1, num_keys=1))
        a64 = (ops[0].astype(jnp.uint64) << 32) | ops[1].astype(jnp.uint64)
        b64 = (ops[2].astype(jnp.uint64) << 32) | ops[3].astype(jnp.uint64)
        ms = bench(f, key, a64, b64)
        print(f"sort 1xu32key + 2xu64 (=5 u32 payload): {ms:.1f} ms")
    except Exception as e:
        print("u64 pack:", type(e).__name__, str(e)[:100])

    # shorter rows (segmenting): same total elements, W/4 rows
    key4 = key.reshape(B * 4, W // 4)
    ops4 = [o.reshape(B * 4, W // 4) for o in ops]
    f = jax.jit(lambda k, *o: jax.lax.sort([k, *o], dimension=1,
                                           num_keys=1))
    ms = bench(f, key4, *ops4)
    print(f"sort 9 ops u32 (B={B*4}, W={W//4}): {ms:.1f} ms")
    ms = bench(f, key4.reshape(B * 16, W // 16),
               *[o.reshape(B * 16, W // 16) for o in ops4])
    print(f"sort 9 ops u32 (B={B*16}, W={W//16}): {ms:.1f} ms")

    # gather cost check: take_along_axis by sorted index
    f = jax.jit(lambda k, o: jnp.take_along_axis(
        o, jnp.argsort(k, axis=1), axis=1))
    try:
        ms = bench(f, key, ops[0], n=2)
        print(f"argsort+gather 1 op: {ms:.1f} ms")
    except Exception as e:
        print("gather:", type(e).__name__, str(e)[:100])

    # u16 sort (half-width keys)
    k16 = (key >> 16).astype(jnp.uint16)
    f = jax.jit(lambda k, o: jax.lax.sort([k, o], dimension=1, num_keys=1))
    ms = bench(f, k16, ops[0])
    print(f"sort u16 key + 1 u32: {ms:.1f} ms")


if __name__ == "__main__":
    main()
