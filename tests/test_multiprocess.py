"""Real 2-process jax.distributed test (VERDICT r2 item 5).

Spawns two CPU-backend processes that join one distributed runtime via
flate_tpu.parallel.distributed.initialize, build a GLOBAL mesh, and run
the SURVEY §2.4 collective checklist items the multi-host compressor
depends on: (b) per-shard compressed-length all-gather -> offset prefix
sums, (d) scalar psum.  Each process asserts the globally-consistent
results; the parent asserts both exited 0.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    pid, port = int(sys.argv[1]), sys.argv[2]

    from flate_tpu.parallel import distributed as dist
    rank = dist.initialize(coordinator=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert rank == pid, (rank, pid)
    assert jax.process_count() == 2
    devs = jax.devices()
    assert len(devs) == 4, devs          # 2 local x 2 processes

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(devs), ("d",))

    # (b) length all-gather -> offset prefix sum: each device
    # contributes one "compressed length"; all processes must agree on
    # the global offsets.
    local = np.array([100 * (2 * pid + i) + 7 for i in range(2)],
                     dtype=np.int32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local, (4,))

    def gather_offsets(lens):
        all_lens = jax.lax.all_gather(lens, "d", tiled=True)
        offs = jnp.cumsum(all_lens) - all_lens
        i = jax.lax.axis_index("d")
        return jax.lax.dynamic_slice(offs, (i,), (1,))

    offs = jax.jit(
        shard_map(gather_offsets, mesh=mesh, in_specs=P("d"),
                  out_specs=P("d")),
    )(garr)
    expect_lens = np.array([7, 107, 207, 307])
    expect_offs = np.cumsum(expect_lens) - expect_lens
    for sh in offs.addressable_shards:
        lo = sh.index[0].start or 0
        got = np.asarray(sh.data)
        assert (got == expect_offs[lo:lo + got.size]).all(), \
            (got, expect_offs, lo)

    # (d) scalar psum across the full mesh
    def total(lens):
        return jax.lax.psum(jnp.sum(lens), "d")
    tot = jax.jit(shard_map(total, mesh=mesh, in_specs=P("d"),
                            out_specs=P()))(garr)
    assert int(np.asarray(jax.device_get(tot))) == int(expect_lens.sum())
    print(f"proc {pid} ok")
""")


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # the axon plugin (on PYTHONPATH) initializes the XLA backend at
    # interpreter startup, which jax.distributed.initialize forbids —
    # strip it; the workers import flate_tpu from the cwd
    env["PYTHONPATH"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} ok" in out
