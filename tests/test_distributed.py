"""Multi-host scaffolding: regions, init no-op, scaling harness."""
import gzip as pygzip

import jax
import numpy as np
import pytest

from flate_tpu.parallel import distributed as dist
from flate_tpu.parallel.mesh2 import compress_mesh2


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    return jax.sharding.Mesh(np.array(devs[:8]), ("shards",))


def test_initialize_single_process_noop():
    assert dist.initialize() == jax.process_index() == 0


def test_compress_to_regions_covers_stream(mesh):
    data = (b"region coverage test corpus " * 3000)[:65536]
    blob, regions = dist.compress_to_regions(
        data, mesh, level=6, shard_len=2048, ctx=1024, per_device=2,
        interpret=True)
    assert pygzip.decompress(blob) == data
    # single process: all spans belong to owner 0 and tile the stream
    assert len(regions) == 1
    pos = 0
    for off, ln in regions[0]:
        assert off == pos
        pos += ln
    assert pos == len(blob)


def test_regions_by_device_match_shard_ownership(mesh):
    """Device d's spans are exactly the bytes of the shards its batch
    rows encoded — cross-checked against an independent 1-device run
    (mesh streams are bit-identical to single-device streams)."""
    data = (b"ownership 0123456789 abcdefgh " * 4000)[:96 * 1024]
    blob, regions = dist.compress_to_regions(
        data, mesh, level=6, shard_len=2048, ctx=1024, per_device=2,
        by="device", interpret=True)
    assert pygzip.decompress(blob) == data

    mesh1 = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("shards",))
    blob1, comp_lens, hdr_len, foot_len = compress_mesh2(
        data, mesh1, level=6, shard_len=2048, ctx=1024, per_device=2,
        return_lens=True, interpret=True)
    assert blob1 == blob

    ndev, per_device = 8, 2
    batch = ndev * per_device
    offs = [hdr_len]
    for cl in comp_lens:
        offs.append(offs[-1] + cl)
    expected = [[] for _ in range(ndev)]
    expected[0].append((0, hdr_len))
    for s, cl in enumerate(comp_lens):
        d = (s % batch) // per_device
        exp = expected[d]
        if exp and exp[-1][0] + exp[-1][1] == offs[s]:
            exp[-1] = (exp[-1][0], exp[-1][1] + cl)
        else:
            exp.append((offs[s], cl))
    expected[ndev - 1].append((offs[-1], foot_len))
    # merge footer into a preceding adjacent span like the impl does
    last = expected[ndev - 1]
    merged = []
    for off, ln in last:
        if merged and merged[-1][0] + merged[-1][1] == off:
            merged[-1] = (merged[-1][0], merged[-1][1] + ln)
        else:
            merged.append((off, ln))
    expected[ndev - 1] = merged
    assert [list(map(tuple, r)) for r in regions] == expected
    # spans jointly tile the stream
    allspans = sorted(sp for r in regions for sp in r)
    pos = 0
    for off, ln in allspans:
        assert off == pos
        pos += ln
    assert pos == len(blob)


def test_scaling_harness_runs():
    r = dist.scaling_efficiency(size_mb=1, level=1, shard_len=2048)
    assert r["n_devices"] >= 1
    assert r["gbps_1"] > 0 and r["gbps_n"] > 0
    assert 0 < r["efficiency"] <= 1.5
