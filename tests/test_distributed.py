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
    # regions tile the stream exactly, in order, without overlap
    pos = 0
    for off, ln in regions:
        assert off == pos
        pos += ln
    assert pos == len(blob)


def test_scaling_harness_runs():
    r = dist.scaling_efficiency(size_mb=1, level=1, shard_len=2048)
    assert r["n_devices"] >= 1
    assert r["gbps_1"] > 0 and r["gbps_n"] > 0
    assert 0 < r["efficiency"] <= 1.5
