"""Calibration probe for a VMEM bitonic sort kernel (round-5 sort work).

The carried-operand lax.sort is HBM-bound (~22 GB moved for the
9-operand level-6 payload ~= 27 ms at 819 GB/s).  A row-resident VMEM
bitonic would pay ~2 HBM passes + VPU compute: 171 substages x 262K
elements x ~20 vops x 64 rows ~= 57 Gops.  Whether that beats 27 ms
depends entirely on achieved VPU throughput on v5e — this probe runs a
representative slice of substages in a Pallas kernel and extrapolates.

Run: python tools/bitonic_probe.py          (real chip)
     JAX_PLATFORMS=cpu python tools/bitonic_probe.py   (correctness)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 2048, 128              # one row: 262144 elements as (R, C) i32
NOPS = 9                      # key + 8 carried operands


def _partner(x, j):
    """x (R, C); partner along flat index i ^ j (j a power of two)."""
    if j >= C:
        m = j // C
        # rows grouped as (R/2m, 2, m): swap the pair halves
        return x.reshape(R // (2 * m), 2, m, C)[:, ::-1].reshape(R, C)
    # lanes grouped as (C/2j, 2, j): swap halves within each group
    return x.reshape(R, C // (2 * j), 2, j)[:, :, ::-1].reshape(R, C)


def _substage(key, ops, j, k):
    kp = _partner(key, j)
    iota = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    up = (iota & j) == 0                 # lower element of the pair
    asc = (iota & k) == 0                # ascending region of stage k
    # keep = min on (up == asc), max otherwise
    takep = (kp < key) == (up == asc)
    nkey = jnp.where(takep, kp, key)
    nops = [jnp.where(takep, _partner(o, j), o) for o in ops]
    return nkey, nops


def _kernel(stages, key_ref, *refs):
    ops_refs = refs[:NOPS - 1]
    out_refs = refs[NOPS - 1:]
    key = key_ref[0]
    ops = [r[0] for r in ops_refs]
    for (j, k) in stages:
        key, ops = _substage(key, ops, j, k)
    out_refs[0][0] = key
    for i, o in enumerate(ops):
        out_refs[1 + i][0] = o


@functools.partial(jax.jit, static_argnames=("stages", "interpret"))
def run(key, ops, stages, interpret=False):
    B = key.shape[0]
    spec = pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, R, C), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_kernel, stages),
        grid=(B,),
        in_specs=[spec] * NOPS,
        out_specs=(spec,) * NOPS,
        out_shape=(shape,) * NOPS,
        interpret=interpret,
    )(key, *ops)


def correctness():
    """Full 2^18 bitonic on one row equals np.sort (interpret mode)."""
    rng = np.random.default_rng(0)
    n = R * C
    key = rng.integers(0, 2**32, (1, R, C), dtype=np.uint32)
    ops = [key + np.uint32(i + 1) for i in range(NOPS - 1)]
    stages = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            stages.append((j, k))
            j //= 2
        k *= 2
    out = run(jnp.asarray(key), [jnp.asarray(o) for o in ops],
              tuple(stages), interpret=True)
    got = np.asarray(out[0]).reshape(-1)
    want = np.sort(key.reshape(-1))
    assert (got == want).all(), "bitonic key order wrong"
    # carried operand followed its key
    assert (np.asarray(out[1]).reshape(-1) == got + 1).all()
    print("correctness: OK", flush=True)


def calibrate(B=8):
    """Time a representative substage mix on chip; extrapolate."""
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, (B, R, C), dtype=np.uint32))
    ops = [key + np.uint32(i) for i in range(NOPS - 1)]
    # representative mix: large-j (row swaps), mid, small-j (lane swaps)
    mix = ((131072 // C * C, 262144), (1024, 262144), (64, 262144),
           (8, 262144), (1, 262144), (2048, 262144), (256, 262144),
           (16, 262144))
    mix = tuple((j if j >= 1 else 1, k) for j, k in mix)
    f = lambda: run(key, ops, mix)
    r = f()
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.reshape(-1)[:1])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        r = f()
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf.reshape(-1)[:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    per_sub = ms / len(mix) / B          # ms per substage per row
    full = per_sub * 171 * 64            # 171 substages, 64 rows
    print(f"{len(mix)} substages x {B} rows: {ms:.2f} ms "
          f"-> {per_sub*1e3:.1f} us/substage/row "
          f"-> full sort est {full:.1f} ms (lax.sort: ~27 ms)",
          flush=True)


if __name__ == "__main__":
    import sys
    if jax.default_backend() == "cpu":
        correctness()
    else:
        calibrate()
