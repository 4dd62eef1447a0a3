"""Multi-host orchestration: jax.distributed init, per-host file regions,
scaling measurement.

The reference is single-process (SURVEY §2.4) — this is the new-design
piece that scales the pigz-style mesh compressor across hosts:

* `initialize()` wraps `jax.distributed.initialize` (idempotent; no-op
  for single-process runs) so every host joins one global runtime and
  `jax.devices()` spans the pod slice.  Collectives inside
  `mesh2.compress_mesh2` then ride ICI within a slice and DCN across
  hosts automatically — the mesh is laid over global devices.
* `compress_to_regions()` runs the mesh compressor and returns each
  host's byte region (offset, bytes) of the final stream, computed from
  a device all-gather of per-shard compressed lengths -> exclusive
  prefix sum, so hosts can write a shared file without exchanging
  payload bytes over DCN: host h writes only the shards its local
  devices produced.  CRC32 is combined with the GF(2) operator
  (checksums.crc32_combine) instead of re-hashing.
* `scaling_efficiency()` measures throughput at 1 device vs N devices
  on the current backend — the bench hook for the ≥80 %-at-2-hosts
  target (BASELINE.md).  On CPU it validates the machinery; on a pod it
  is the real number.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from .. import consts
from ..containers import Container
from .mesh2 import compress_mesh2, make_mesh

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Join (or create) the multi-host runtime; returns process index.

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted; single-process when neither is present."""
    global _initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if coordinator and num_processes > 1 and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        _initialized = True
    return jax.process_index()


def compress_to_regions(data: bytes, mesh=None, level: int = 6,
                        container: Container = Container.GZIP,
                        shard_len: int = consts.SHARD_LEN,
                        per_device: int = 4, by: str = "process",
                        **kw):
    """Mesh-compress and return (stream, regions).

    regions[o] = list of (file_offset, nbytes) spans owned by owner o
    (o = process by default, or device with by="device"), derived from
    the per-shard compressed lengths by ownership: shard s lives in
    batch row s % batch, which device (s % batch) // per_device
    encoded.  The header belongs to owner 0 and the footer to the last
    owner, so each host can `pwrite()` exactly the bytes its own
    devices produced into a shared file — no payload crosses DCN.
    Adjacent spans of one owner are merged."""
    mesh = mesh if mesh is not None else make_mesh()
    blob, comp_lens, hdr_len, foot_len = compress_mesh2(
        data, mesh, level=level, container=container,
        shard_len=shard_len, per_device=per_device, return_lens=True,
        **kw)
    devs = list(mesh.devices.flat)
    batch = len(devs) * per_device
    if by == "device":
        owner_of = list(range(len(devs)))
        nowners = len(devs)
    else:
        owner_of = [d.process_index for d in devs]
        nowners = jax.process_count()
    regions: list[list[tuple[int, int]]] = [[] for _ in range(nowners)]

    def add(o: int, off: int, ln: int) -> None:
        if ln <= 0:
            return
        if regions[o] and regions[o][-1][0] + regions[o][-1][1] == off:
            prev_off, prev_ln = regions[o][-1]
            regions[o][-1] = (prev_off, prev_ln + ln)
        else:
            regions[o].append((off, ln))

    add(0, 0, hdr_len)
    off = hdr_len
    for s, cl in enumerate(comp_lens):
        add(owner_of[(s % batch) // per_device], off, cl)
        off += cl
    add(nowners - 1, off, foot_len)
    assert off + foot_len == len(blob)
    return blob, regions


def scaling_efficiency(size_mb: int = 8, level: int = 6,
                       shard_len: int = 64 * 1024,
                       interpret: bool | None = None) -> dict:
    """Throughput at 1 device vs all devices on this backend.

    Returns {"n_devices", "gbps_1", "gbps_n", "efficiency"} where
    efficiency = gbps_n / (n * gbps_1)."""
    devs = jax.devices()
    n = len(devs)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    text = (b"scaling measurement corpus " * 1024)
    data = (text * (size_mb * 1024 * 1024 // len(text) + 1))
    data = data[: size_mb * 1024 * 1024]

    ctx = min(consts.MAX_DISTANCE, shard_len)

    def run(mesh):
        compress_mesh2(data, mesh, level=level, shard_len=shard_len,
                       ctx=ctx, interpret=interpret)   # warm/compile
        t0 = time.time()
        compress_mesh2(data, mesh, level=level, shard_len=shard_len,
                       ctx=ctx, interpret=interpret)
        return len(data) / (time.time() - t0) / 1e9

    mesh1 = jax.sharding.Mesh(np.array(devs[:1]), ("shards",))
    meshn = jax.sharding.Mesh(np.array(devs), ("shards",))
    g1 = run(mesh1)
    gn = run(meshn) if n > 1 else g1
    return {"n_devices": n, "gbps_1": round(g1, 4), "gbps_n": round(gn, 4),
            "efficiency": round(gn / (n * g1), 3) if n > 1 else 1.0}
