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
import os
NOPS = int(os.environ.get("BP_NOPS", "9"))  # key + carried operands


def _partner(x, j, m):
    """x (R, C); partner along flat index i ^ j (dynamic powers of two;
    m = j // C when j >= C else 0).  XOR pairing as two dynamic rolls +
    a select (Mosaic lowers pltpu.roll with traced shifts; reshapes/rev
    do not lower)."""
    row_case = m > 0
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    mm = jnp.maximum(m, 1)
    jj = jnp.maximum(j, 1)
    fwd_r = pltpu.roll(x, R - mm, 0)
    bwd_r = pltpu.roll(x, mm, 0)
    pr = jnp.where((idx_r & mm) == 0, fwd_r, bwd_r)
    fwd_c = pltpu.roll(x, C - jj, 1)
    bwd_c = pltpu.roll(x, jj, 1)
    pc = jnp.where((idx_c & jj) == 0, fwd_c, bwd_c)
    return jnp.where(row_case, pr, pc)


def _kernel(nstages, stage_ref, key_ref, *refs):
    ops_refs = refs[:NOPS - 1]
    out_refs = refs[NOPS - 1:]
    out_refs[0][0] = key_ref[0]
    for i, r in enumerate(ops_refs):
        out_refs[1 + i][0] = r[0]
    iota = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))

    def body(s, _):
        j = stage_ref[0, s, 0]
        k = stage_ref[0, s, 1]
        m = stage_ref[0, s, 2]
        key = out_refs[0][0]
        kp = _partner(key, j, m)
        up = (iota & j) == 0             # lower element of the pair
        asc = (iota & k) == 0            # ascending region of stage k
        takep = (kp < key) == (up == asc)
        out_refs[0][0] = jnp.where(takep, kp, key)
        for i in range(NOPS - 1):
            o = out_refs[1 + i][0]
            out_refs[1 + i][0] = jnp.where(takep, _partner(o, j, m), o)
        return 0

    jax.lax.fori_loop(0, nstages, body, 0)


@functools.partial(jax.jit, static_argnames=("stages", "interpret"))
def run(key, ops, stages, interpret=False):
    B = key.shape[0]
    spec = pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, R, C), jnp.uint32)
    st = np.asarray([(j, k, j // C if j >= C else 0)
                     for (j, k) in stages], np.int32)
    st_dev = jnp.asarray(np.broadcast_to(st, (B,) + st.shape))
    return pl.pallas_call(
        functools.partial(_kernel, len(stages)),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, len(stages), 3), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM)]
        + [spec] * NOPS,
        out_specs=(spec,) * NOPS,
        out_shape=(shape,) * NOPS,
        # in-place accumulate in the OUT refs; alias so HBM stays one
        # copy per operand (v5e VMEM is 16 MB)
        input_output_aliases={1 + i: i for i in range(NOPS)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(st_dev, key, *ops)


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
