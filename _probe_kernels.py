"""Probe Mosaic/XLA primitive costs on the real chip for pipeline v2 design.

P1: jnp.cumsum on (B, S) i32
P2: jnp.sort of u32 (B, W)
P3: take_along_axis row gather (B, W, nw)
P4: pallas: dynamic sublane store legality + per-group matmul packer core
P5: onehot-compare build throughput
P6: bf16 matmul throughput sanity
"""
import time
import numpy as np
import flate_tpu.jx  # cache config
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(f, *a, n=10, warm=2, label=""):
    try:
        for _ in range(warm):
            r = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            r = jax.block_until_ready(f(*a))
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.2f} ms")
        return dt, r
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None, None

B, W = 8, 160 * 1024
S = 262144

# P1 cumsum
x = jnp.ones((B, S), jnp.int32)
timeit(jax.jit(lambda x: jnp.cumsum(x, axis=1)), x, label=f"P1 cumsum ({B},{S}) i32")

# P2 u32 single-array sort
k = jax.random.randint(jax.random.PRNGKey(0), (B, W), 0, 1 << 30, dtype=jnp.int32)
timeit(jax.jit(lambda k: jnp.sort(k, axis=1)), k, label=f"P2 sort ({B},{W}) i32")
timeit(jax.jit(lambda k: jnp.argsort(k, axis=1)), k, label=f"P2b argsort ({B},{W})")

# P3 row gather
for nw in (4, 8):
    words = jax.random.randint(jax.random.PRNGKey(1), (B, W, nw), 0, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (B, W), 0, W, dtype=jnp.int32)
    timeit(jax.jit(lambda w, i: jnp.take_along_axis(w, i[:, :, None], axis=1)),
           words, idx, label=f"P3 row gather ({B},{W},{nw})")

# P4: packer-core kernel — per-group onehot matmul + dynamic sublane accumulate
GRP, WIN = 64, 256
G = S // GRP
NWR = 9000  # out rows of 128... use (NWR, 128): ~ 1.1M words

def pack_kernel(vals_ref, bits_ref, gbase_ref, out_ref):
    out_ref[...] = jnp.zeros_like(out_ref)
    def body(g, carry):
        v = vals_ref[0, pl.ds(g, 1), :].astype(jnp.uint32)      # (1, GRP)
        bts = bits_ref[0, pl.ds(g, 1), :]                        # (1, GRP)
        base = gbase_ref[0, g]                                   # scalar i32
        # in-group exclusive cumsum of bits via log-shifts
        c = bts
        acc = bts
        for sh in (1, 2, 4, 8, 16, 32):
            if sh < GRP:
                rolled = pltpu.roll(acc, sh, 1)
                mask = jax.lax.broadcasted_iota(jnp.int32, (1, GRP), 1) >= sh
                acc = acc + jnp.where(mask, rolled, 0)
        off = base + acc - bts                                   # exclusive
        aligned = (base >> 5) & ~3                               # align rows of 128? words
        wr = (off >> 5) - aligned
        sh_ = (off & 31).astype(jnp.uint32)
        v0 = v << sh_
        v1 = jnp.where(sh_ == 0, 0, v >> ((32 - sh_) & 31))
        dead = bts == 0
        wr = jnp.where(dead, WIN - 2, wr)  # park dead fields (zero value anyway)
        # onehot (GRP, WIN)
        lane = jax.lax.broadcasted_iota(jnp.int32, (GRP, WIN), 1)
        oh = (lane == wr.reshape(GRP, 1)).astype(jnp.bfloat16)
        oh1 = (lane == (wr + 1).reshape(GRP, 1)).astype(jnp.bfloat16)
        # byte planes (4, GRP)
        def planes(x):
            x = x.reshape(GRP, 1).astype(jnp.uint32)
            return jnp.concatenate([
                ((x >> (8 * p)) & 0xFF).astype(jnp.int32).astype(jnp.bfloat16) for p in range(4)
            ], axis=1).T  # (4, GRP)
        t = (jnp.dot(planes(v0), oh, preferred_element_type=jnp.float32)
             + jnp.dot(planes(v1), oh1, preferred_element_type=jnp.float32))
        ti = t.astype(jnp.int32)  # (4, WIN)
        word = (ti[0:1, :] | (ti[1:2, :] << 8) | (ti[2:3, :] << 16)
                | (ti[3:4, :] << 24)).astype(jnp.uint32)  # (1, WIN)
        row = aligned >> 7  # 128-word rows
        w2 = word.reshape(2, 128)
        cur = out_ref[0, pl.ds(row, 2), :]
        out_ref[0, pl.ds(row, 2), :] = cur + w2
        return carry
    jax.lax.fori_loop(0, G, body, 0)

def run_pack(vals, bits, gbase):
    return pl.pallas_call(
        pack_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, G, GRP), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, G, GRP), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, G), lambda b: (b, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, NWR, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NWR, 128), jnp.uint32),
    )(vals, bits, gbase)

rng = np.random.default_rng(0)
bits_np = rng.integers(0, 15, (1, G, GRP)).astype(np.int32)
vals_np = (rng.integers(0, 1 << 14, (1, G, GRP)).astype(np.uint32)
           & ((1 << bits_np.astype(np.uint32)) - 1))
gsum = bits_np.reshape(1, G * GRP).reshape(1, G, GRP).sum(-1)
gbase_np = np.concatenate([np.zeros((1, 1), np.int32),
                           np.cumsum(gsum, axis=1)[:, :-1].astype(np.int32)], axis=1)
dt, out = timeit(jax.jit(run_pack), jnp.asarray(vals_np), jnp.asarray(bits_np),
                 jnp.asarray(gbase_np), n=5, label=f"P4 pack kernel S={S} GRP={GRP}")
if out is not None:
    # verify vs numpy reference pack
    from flate_tpu.bitpack import pack_bits_np
    ref, total = pack_bits_np(vals_np.reshape(-1).astype(np.uint64),
                              bits_np.reshape(-1))
    got = np.asarray(out).reshape(-1)[:ref.size - 2]
    ok = np.array_equal(got, ref[:got.size])
    print("P4 correctness:", ok, "total bits", total)


# P7: element gather / scatter costs
idx2 = jax.random.randint(jax.random.PRNGKey(3), (B, W), 0, W, dtype=jnp.int32)
vals2 = jax.random.randint(jax.random.PRNGKey(4), (B, W), 0, 1000, dtype=jnp.int32)
timeit(jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), vals2, idx2,
       label=f"P7 element gather ({B},{W})")
def scat(a, i, v):
    base = (jnp.arange(B, dtype=jnp.int32) * W)[:, None]
    flat = (base + i).reshape(-1)
    return jnp.zeros(B * W, jnp.int32).at[flat].add(v.reshape(-1))
timeit(jax.jit(scat), vals2, idx2, vals2, label=f"P7b flat scatter-add ({B},{W})")
def scat_set(a, i, v):
    base = (jnp.arange(B, dtype=jnp.int32) * W)[:, None]
    flat = (base + i).reshape(-1)
    return jnp.zeros(B * W, jnp.int32).at[flat].set(v.reshape(-1))
timeit(jax.jit(scat_set), vals2, idx2, vals2, label=f"P7c flat scatter-set ({B},{W})")
# P8: histogram via scatter-add (B, 286)
sym = jax.random.randint(jax.random.PRNGKey(5), (B, S), 0, 286, dtype=jnp.int32)
def hist(s):
    base = (jnp.arange(B, dtype=jnp.int32) * 286)[:, None]
    flat = (base + s).reshape(-1)
    return jnp.zeros(B * 286, jnp.int32).at[flat].add(1).reshape(B, 286)
timeit(jax.jit(hist), sym, label=f"P8 hist scatter-add ({B},{S})->286")
# P5
a = jnp.ones((4096, 128), jnp.bfloat16)
b2 = jnp.ones((128, 256), jnp.bfloat16)
timeit(jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)), a, b2,
       n=20, label="P6 matmul (4096,128)@(128,256) bf16")
