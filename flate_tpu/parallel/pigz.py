"""pigz-style data-parallel compression over a TPU mesh.

Each 128 KiB shard is an independent deflate unit terminated by a sync
flush, so shards compress with zero cross-device communication; the only
collective state is the ordered splice (per-shard bit lengths) and the
container checksum, combined associatively on the host (or with a tiny
all_gather when staying on device).

Context priming: each shard is primed with the previous shard's last 32 KiB
as read-only history.  jx.pipeline.build_windows assembles the windows on
device with a batch roll of the shard tails; under batch-axis sharding XLA
lowers that roll to a collective permute over ICI, so the context exchange
rides the interconnect with no host round-trip.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import block, consts, tables
from ..bitpack import BitSink
from ..checksums import crc32, crc32_combine
from ..containers import Container, Hasher, write_footer, write_header
from ..jx import pipeline as pl
from ..jx import match as mtc


def make_mesh(devices=None, axis: str = "shards") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def combined_crc32(shard_bytes: list[bytes]) -> int:
    """CRC32 of the concatenation via per-shard CRCs + GF(2) combine —
    the associative reduction a pod slice computes with an all-reduce."""
    crc = 0
    for s in shard_bytes:
        crc = crc32_combine(crc, crc32(s), len(s))
    return crc & 0xFFFFFFFF


def compress_mesh(data: bytes, mesh: Mesh,
                  level: int = consts.LEVEL_DEFAULT,
                  container: Container = Container.GZIP,
                  shard_len: int = consts.SHARD_LEN,
                  ctx: int = mtc.CTX,
                  axis: str = "shards") -> bytes:
    """One-shot compress, data-parallel over the mesh's devices.

    The shard batch axis is sharded across the mesh; phase1/phase2 run
    SPMD with no collectives (independent shards), then the variable-length
    bitstreams are spliced in shard order.
    """
    if level not in consts.LEVEL_PARAMS:
        raise ValueError(f"invalid level {level}")
    K, _nice, lazy, max_lazy = consts.LEVEL_PARAMS[level]
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    ndev = mesh.devices.size
    nfull = n // shard_len

    out = bytearray()
    out += write_header(container)
    sink = BitSink()
    hasher = Hasher(container)
    hasher.nbytes = n
    if container is Container.GZIP:
        # associative per-shard CRC + combine (the multi-host reduction)
        hasher.value = combined_crc32(
            [data[i:i + (1 << 22)] for i in range(0, n, 1 << 22)])
    elif container is Container.ZLIB:
        from ..checksums import adler32
        hasher.value = adler32(data)

    spec_in = NamedSharding(mesh, P(axis, None))
    spec_1d = NamedSharding(mesh, P(axis))

    # process ndev shards per step so each device gets exactly one; the
    # batch-roll inside build_windows becomes the 32K-tail context
    # exchange over ICI (a collective permute inserted by XLA)
    step = ndev
    for base in range(0, nfull, step):
        nb = min(step, nfull - base)
        lo0 = base * shard_len
        shards_np = np.zeros((step, shard_len), dtype=np.uint8)
        shards_np[:nb] = arr[lo0:lo0 + nb * shard_len].reshape(nb, shard_len)
        c0 = min(ctx, lo0)
        ctx0 = np.zeros(ctx, dtype=np.uint8)
        ctx0[ctx - c0:] = arr[lo0 - c0:lo0]
        ctx_lens = np.full(step, ctx, dtype=np.int32)
        ctx_lens[0] = c0
        shard_views = [shards_np[i] for i in range(nb)]

        sdev = jax.device_put(jnp.asarray(shards_np), spec_in)
        cdev = jax.device_put(jnp.asarray(ctx_lens), spec_1d)
        wdev = pl.build_windows(sdev, jnp.asarray(ctx0), ctx=ctx)
        tok, stats = pl.phase1(wdev, cdev, ctx=ctx, K=K, K3=min(8, K),
                               lazy=lazy, max_lazy=max_lazy,
                               nwords=16 if level >= 6 else 8)
        hll, hdd, _nt = pl.unpack_stats(np.asarray(stats))
        plans = pl.plan_shards(hll[:nb], hdd[:nb], shard_views)

        llp = np.zeros((step, consts.NUM_LITLEN), dtype=np.uint32)
        dp = np.zeros((step, consts.NUM_DIST), dtype=np.uint32)
        for i, p in enumerate(plans):
            if p.kind in ("dynamic", "fixed"):
                llp[i] = pl._packed_table(tables.canonical_codes(p.ll_lens),
                                          p.ll_lens, consts.NUM_LITLEN)
                dp[i] = pl._packed_table(tables.canonical_codes(p.d_lens),
                                         p.d_lens, consts.NUM_DIST)
        words, tbits = pl.phase2(
            tok, jax.device_put(jnp.asarray(llp), spec_in),
            jax.device_put(jnp.asarray(dp), spec_in))
        tbits = np.asarray(tbits)
        words = pl.fetch_words(words, tbits)

        for i, p in enumerate(plans):
            is_last = (base + i == nfull - 1) and (n % shard_len == 0)
            pl.emit_shard(sink, p, words[i], int(tbits[i]), shard_views[i],
                          is_last)
            if not is_last:
                block.write_flush_marker(sink)

    rem = arr[nfull * shard_len:]
    if rem.size or nfull == 0:
        from ..deflate import tokenize_shard
        ctx_bytes = arr[max(0, nfull * shard_len - consts.MAX_DISTANCE):
                        nfull * shard_len]
        toks = tokenize_shard(rem, ctx_bytes if ctx_bytes.size else None,
                              level)
        block.write_block(sink, toks, final=True, raw=rem.tobytes())

    sink.align_to_byte()
    out += sink.getvalue()
    out += write_footer(container, hasher)
    return bytes(out)
