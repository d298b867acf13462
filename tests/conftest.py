"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic is tested on a fake CPU mesh, the standard JAX answer
to testing multi-host code on one machine (SURVEY.md §4). Must run before jax
is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["MOSS_PALLAS_INTERPRET"] = "1"  # Pallas kernels run interpreted on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeated pytest runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

# sitecustomize may have imported jax already (with JAX_PLATFORMS=axon baked
# into the environment); override the platform post-import so unit tests run
# on the virtual-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-minute end-to-end tests")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute subprocess e2e drivers)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(3407)  # reference's fixed seed (general_utils.py:141)
