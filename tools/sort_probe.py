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

    for nops in (1, 2, 5, 9):
        f = jax.jit(lambda k, *o: jax.lax.sort([k, *o], dimension=1,
                                               num_keys=1))
        ms = bench(f, key, *ops[: nops - 1])
        print(f"sort {nops} ops u32 (B={B}, W={W}): {ms:.1f} ms",
              flush=True)

    # shorter rows (segmenting): same total elements, W/4 rows
    key4 = key.reshape(B * 4, W // 4)
    ops4 = [o.reshape(B * 4, W // 4) for o in ops]
    f = jax.jit(lambda k, *o: jax.lax.sort([k, *o], dimension=1,
                                           num_keys=1))
    ms = bench(f, key4, *ops4)
    print(f"sort 9 ops u32 (B={B*4}, W={W//4}): {ms:.1f} ms", flush=True)
    ms = bench(f, key4.reshape(B * 16, W // 16),
               *[o.reshape(B * 16, W // 16) for o in ops4])
    print(f"sort 9 ops u32 (B={B*16}, W={W//16}): {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
