"""Data-parallel v2 compression over a TPU mesh (shard_map + ppermute).

pigz-style sharding (SURVEY §2.4): every 128 KiB shard is an independent
deflate unit ending in a sync flush, so the only cross-device traffic is
the 32 KiB context tail each shard borrows from its predecessor.  The
batch axis is laid over the mesh with `shard_map`; the context exchange
is an explicit `lax.ppermute` (device i sends its last local shard tail
to device i+1) that rides ICI.  Everything else — fused matcher, parse,
device Huffman planning, header build, Pallas bit-pack — runs SPMD with
zero collectives, then the host splices the byte-aligned shard streams
in order and writes the FLT1 index + container.

Stream invariant: output is bit-identical to jx.pipeline2's single-
device stream for the same (level, shard_len, ctx) — pinned by
tests/test_parallel.py.

Reference counterpart: the pigz-style parallel deflate the survey's
§2.4 checklist derives from deflate.zig's single-stream loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map as _shard_map_mod  # type: ignore

    def _shard_map(f, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
except (ImportError, AttributeError):
    from jax.experimental.shard_map import shard_map as _sm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)

from .. import consts
from ..checksums import adler32_combine, crc32_combine
from ..containers import Container, GzipMetadata, Hasher, write_footer, \
    write_header
from ..jx import checksum, pipeline2
from .pigz import combined_crc32, make_mesh  # noqa: F401 (re-export)

CTX = consts.MAX_DISTANCE


@functools.lru_cache(maxsize=32)
def _mesh_encode_fn(mesh: Mesh, axis: str, ndev: int, *, S: int, ctx: int,
                    K: int, nw: int, lazy: bool, max_lazy: int,
                    K3: int = 0, squeeze: bool = False, blk: int = 1024,
                    hash_kind: str = "crc", interpret: bool = False):
    """Build (and cache) the jitted shard_map encode step for this mesh
    geometry — cached so repeated compress calls reuse the compilation.

    The per-shard checksum (CRC32 / Adler32) runs SPMD inside the same
    program — each device hashes only its local shards
    (jx/checksum GF(2) kernels) and the host combines in stream order,
    so no host ever hashes (or needs to hold) the full input."""

    def body(shards, ctx0, ctx_lens, valid, finals, nb):
        # local rows: (B/ndev, S)
        Bl = shards.shape[0]
        tails = shards[:, S - ctx:]
        prev = jnp.concatenate(
            [jnp.zeros((1, ctx), shards.dtype), tails[:-1]], axis=0)
        # device i's last tail -> device i+1's first row context
        from_prev = jax.lax.ppermute(
            tails[-1:], axis, [(i, i + 1) for i in range(ndev - 1)])
        idx = jax.lax.axis_index(axis)
        first = jnp.where(idx == 0, ctx0[None, :], from_prev)
        prev = jnp.concatenate([first, prev[1:]], axis=0)
        windows = jnp.concatenate([prev, shards], axis=1)
        words, tbits, kind = pipeline2.encode_core(
            windows, ctx_lens, valid, finals, S=S, ctx=ctx, K=K, nw=nw, K3=K3,
            lazy=lazy, max_lazy=max_lazy, squeeze=squeeze, blk=blk,
            interpret=interpret)
        if hash_kind == "adler":
            s1, s2 = checksum._adler_rows_any(shards, valid)
            h = jnp.stack([s1, s2], axis=1)
        else:
            h = jnp.stack([checksum._crc32_rows_any(shards),
                           jnp.zeros(shards.shape[0], jnp.uint32)], axis=1)
        # per-device stream compaction (the single-device packed seam,
        # SPMD): each device splices its LOCAL shard streams so its
        # host fetches exact bytes + a small meta row, never the
        # padded word grid.  Global row index bounds live rows.
        grow = idx * Bl + jnp.arange(Bl, dtype=jnp.int32)
        live = grow < nb
        blens = jnp.where(live, tbits // 8, 0)
        offs = jnp.cumsum(blens) - blens
        total = offs[Bl - 1] + blens[Bl - 1]
        byts = pipeline2._words_to_bytes(words)
        L = byts.shape[1]
        buf = jnp.zeros((Bl * L,), jnp.uint8)
        for i in range(Bl):
            buf = jax.lax.dynamic_update_slice(buf, byts[i], (offs[i],))
        meta_out = jnp.concatenate(
            [total[None].astype(jnp.int32), blens.astype(jnp.int32)])
        return buf[None, :], meta_out[None, :], h

    mapped = _shard_map(
        body, mesh,
        in_specs=(P(axis, None), P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)))
    return jax.jit(mapped)


def compress_mesh2(data: bytes, mesh: Mesh | None = None,
                   level: int = consts.LEVEL_DEFAULT,
                   container: Container = Container.GZIP,
                   shard_len: int = consts.SHARD_LEN,
                   ctx: int = CTX, per_device: int = 4,
                   axis: str = "shards", index: bool = True,
                   interpret: bool = False,
                   return_lens: bool = False):
    """One-shot compress, data-parallel over the mesh, v2 pipeline.

    Dispatch-ahead: the next sharded batch is enqueued before the
    current batch's words are fetched, overlapping H2D/compute/D2H."""
    if level not in pipeline2.LEVEL_KERNEL:
        raise ValueError(f"invalid level {level}")
    K, nw, lazy, max_lazy, K3, squeeze, blk = pipeline2.LEVEL_KERNEL[level]
    blk = min(blk, shard_len)
    while shard_len % blk:
        blk //= 2
    mesh = mesh if mesh is not None else make_mesh(axis=axis)
    ndev = mesh.devices.size
    batch = ndev * per_device
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    S = shard_len
    nshards = max(1, -(-n // S))

    hash_kind = {Container.GZIP: "crc", Container.ZLIB: "adler"}.get(
        container, "crc")
    enc = _mesh_encode_fn(mesh, axis, ndev, S=S, ctx=ctx, K=K, nw=nw,
                          lazy=lazy, max_lazy=max_lazy, K3=K3,
                          squeeze=squeeze, blk=blk, hash_kind=hash_kind,
                          interpret=interpret)
    spec_row = NamedSharding(mesh, P(axis, None))
    spec_1d = NamedSharding(mesh, P(axis))
    spec_rep = NamedSharding(mesh, P())

    # checksums roll on-device per shard (inside the shard_map program,
    # sharing the encode upload) and tree-combine on host in stream
    # order — no host hashes the full input (VERDICT r3 Missing #4)
    hasher = Hasher(container)

    def dispatch(base_shard: int):
        nb = min(batch, nshards - base_shard)
        lo0 = base_shard * S
        shards_np = np.zeros((batch, S), dtype=np.uint8)
        take_n = min(n - lo0, nb * S)
        shards_np.reshape(-1)[:take_n] = arr[lo0:lo0 + take_n]
        c0 = min(ctx, lo0)
        ctx0 = np.zeros(ctx, dtype=np.uint8)
        if c0:
            ctx0[ctx - c0:] = arr[lo0 - c0:lo0]
        ctx_lens = np.full(batch, ctx, dtype=np.int32)
        ctx_lens[0] = c0
        valid = np.full(batch, S, dtype=np.int32)
        for i in range(nb):
            valid[i] = min(S, n - (base_shard + i) * S)
        valid[nb:] = 0
        finals = np.zeros(batch, dtype=np.int32)
        if base_shard + nb == nshards:
            finals[nb - 1] = 1
        buf, meta, h = enc(
            jax.device_put(jnp.asarray(shards_np), spec_row),
            jax.device_put(jnp.asarray(ctx0), spec_rep),
            jax.device_put(jnp.asarray(ctx_lens), spec_1d),
            jax.device_put(jnp.asarray(valid), spec_1d),
            jax.device_put(jnp.asarray(finals), spec_1d),
            jax.device_put(jnp.asarray(np.int32(nb)), spec_rep))
        try:
            meta.copy_to_host_async()
        except AttributeError:
            pass
        return nb, buf, meta, h, valid

    out = bytearray()
    comp_lens: list = []
    Bl = batch // ndev
    fetchers = [pipeline2._ByteFetcher() for _ in range(ndev)]
    bases = list(range(0, nshards, batch))
    inflight = dispatch(bases[0])
    for j in range(len(bases)):
        nb, buf, meta, h, valid = inflight
        if j + 1 < len(bases):
            inflight = dispatch(bases[j + 1])
        # per-device exact-bytes fetch (on a multi-host pod each host
        # fetches only its own devices' regions — distributed.py)
        meta_np = np.asarray(meta)               # (ndev, 1 + Bl)
        for d in range(ndev):
            g0 = d * Bl
            if g0 >= nb:
                break
            out += fetchers[d](buf[d], int(meta_np[d, 0])).tobytes()
            for i in range(min(Bl, nb - g0)):
                comp_lens.append(int(meta_np[d, 1 + i]))
        h_np = np.asarray(h)
        if hash_kind == "adler":
            vals = checksum.adler_finalize(h_np[:nb, 0], h_np[:nb, 1],
                                           valid[:nb])
            for i in range(nb):
                ln = int(valid[i])
                if ln:
                    hasher.value = adler32_combine(
                        hasher.value, int(vals[i]), ln)
                hasher.nbytes += ln
        else:
            vals = checksum.crc32_fixup(h_np[:nb, 0], valid[:nb],
                                        checksum.padded_width(S))
            for i in range(nb):
                ln = int(valid[i])
                if ln:
                    hasher.value = crc32_combine(
                        hasher.value, int(vals[i]), ln)
                hasher.nbytes += ln

    if index and container is Container.GZIP and nshards <= 8000:
        from ..jx import inflate2
        out_lens = [min(S, n - i * S) if n else 0 for i in range(nshards)]
        meta = GzipMetadata(
            extra=inflate2.build_index_extra(comp_lens, out_lens))
        header = write_header(container, meta)
    else:
        header = write_header(container)
    footer = write_footer(container, hasher)
    blob = header + bytes(out) + footer
    if return_lens:
        return blob, comp_lens, len(header), len(footer)
    return blob
