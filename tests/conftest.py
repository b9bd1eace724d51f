"""Test env: force JAX onto CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the JAX analog of a fake process group)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon site hook pins JAX_PLATFORMS before conftest runs; override
# through the config API (effective until the backend initializes)
os.environ["GCTPLUS_NO_COMPILE_CACHE"] = "1"
import jax

jax.config.update("jax_platforms", "cpu")
# the package's cache bootstrap gates on the (hook-pinned) env var, so
# also clear it explicitly: CPU AOT artifacts are machine-feature-
# sensitive and must never be cached from test runs
jax.config.update("jax_compilation_cache_dir", None)

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / end-to-end tests")


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only upstream reference, used ONLY as a golden
    parity oracle in tests (never imported by library code)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    return REFERENCE_ROOT
