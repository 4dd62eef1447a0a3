"""Test configuration.

Sharding / device tests run on a virtual 8-device CPU mesh so multi-chip
paths are testable without a pod (SURVEY §4 translation note).

This environment PRE-IMPORTS jax at interpreter startup (the axon TPU
tunnel plugin), so environment variables like JAX_PLATFORMS / XLA_FLAGS are
snapshotted before any test code runs.  The only reliable override is the
programmatic config API.
"""

import os
import pathlib

# Disable the (default-on) persistent compilation cache for the suite:
# cache writes during long one-process pytest runs crashed inside jax's
# cache-write path (round-3 verdict Missing #5).  Must happen before
# any test module imports flate_tpu.jx.
os.environ.setdefault("FLATE_TPU_CACHE", "0")

import jax
import pytest

# restrict platform DISCOVERY to cpu (not just the default backend):
# the axon plugin's get_backend hook otherwise initializes the TPU
# tunnel for every dispatch, so a tunnel outage would fail CPU tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

DATA = pathlib.Path(__file__).parent / "data"

# ---------------------------------------------------------------------------
# Suite tiering (VERDICT r4 Next #6): `pytest -m "not slow"` is the fast
# tier — full host path + one device smoke per kernel family, < 5 min in
# one process.  The files below are dominated by interpret-mode Pallas
# or multi-MB corpora; tests/test_fast_smoke.py keeps a fast smoke for
# every family whose full file is slow.  Measured single-file times are
# recorded in STATUS.md.
SLOW_FILES = {
    "test_device_sizes.py", "test_pipeline2.py", "test_jx_inflate2.py",
    "test_tokens.py", "test_roundtrip.py", "test_distributed.py",
    "test_mesh2.py", "test_jx_encode2.py", "test_block_fixtures.py",
    "test_jx.py", "test_sizes.py", "test_squeeze.py",
    "test_decoder_fuzz_differential.py", "test_metrics.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode Pallas / multi-MB tests "
        "(excluded from the fast tier: pytest -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in SLOW_FILES:
            item.add_marker(pytest.mark.slow)

# XLA:CPU segfaults inside backend_compile_and_load when a BIG program
# compiles late in a long one-process run (hundreds of accumulated
# executables; observed at 83-98% across two full runs, always passing
# in isolation).  Dropping the live-executable set periodically keeps
# the compiler healthy; re-compiles cost a few seconds per module.
_TEST_COUNTER = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    yield
    _TEST_COUNTER["n"] += 1
    if _TEST_COUNTER["n"] % 48 == 0:
        jax.clear_caches()


@pytest.fixture(scope="session")
def fuzz_dir() -> pathlib.Path:
    return DATA / "fuzz"


@pytest.fixture(scope="session")
def block_writer_dir() -> pathlib.Path:
    return DATA / "block_writer"


@pytest.fixture(scope="session")
def rfc_text() -> bytes:
    return (DATA / "rfc1951.txt").read_bytes()
