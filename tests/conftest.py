"""Test environment: force CPU backend with 8 virtual devices.

Multi-chip sharding (pjit over a Mesh) is validated on a virtual CPU mesh,
mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment pre-imports jax and pins JAX_PLATFORMS=axon (remote TPU
# tunnel) via sitecustomize, so the env var above may be read too late —
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
# This JAX build defaults f32 dots to a bf16-accumulated fast path; parity
# tests against fp32 torch goldens need true fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    def _load(name: str):
        return np.load(GOLDEN_DIR / f"{name}.npz")

    return _load
