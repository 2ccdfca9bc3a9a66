"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

This mirrors the driver's multi-chip dry-run environment
(``xla_force_host_platform_device_count``) so sharding tests exercise real
SPMD partitioning without TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The surrounding environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize imports jax before conftest runs, so env vars are too late —
# force the platform through the live config instead.
jax.config.update("jax_platforms", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

# Parity tests compare against fp32 torch references; JAX's CPU backend
# (oneDNN) and TPU both default to reduced-precision matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture(scope="session")
def golden():
    """Load golden fixtures generated from the PyTorch reference.

    Regenerate with ``python tests/golden/gen_golden.py`` (requires the
    read-only reference checkout at /root/reference).
    """
    path = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")
    if not os.path.exists(path):
        pytest.skip("golden fixtures not generated")
    return dict(np.load(path, allow_pickle=True))
