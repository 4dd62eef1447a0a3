"""Test configuration.

Sharding / device tests run on a virtual 8-device CPU mesh so multi-chip
paths are testable without a pod (SURVEY §4 translation note).  Set up the
XLA flags BEFORE jax initializes.
"""

import os
import pathlib

# force-override: the environment pre-sets JAX_PLATFORMS=axon (the TPU
# tunnel) and the plugin ignores JAX_PLATFORMS=cpu, but honours
# JAX_PLATFORM_NAME
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def fuzz_dir() -> pathlib.Path:
    return DATA / "fuzz"


@pytest.fixture(scope="session")
def block_writer_dir() -> pathlib.Path:
    return DATA / "block_writer"


@pytest.fixture(scope="session")
def rfc_text() -> bytes:
    return (pathlib.Path("/root/reference/src/flate/testdata/rfc1951.txt")
            .read_bytes())
