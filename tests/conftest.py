"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
multi-device sharding paths are testable without TPU hardware — the
strategy SURVEY.md §4 calls out as the gap to add over the reference's
test suite.
"""

import os
import sys

# NOTE: isolation from the axon TPU-tunnel plugin (which stalls CPU
# compiles) happens in tests/axon_guard.py, loaded via pytest.ini addopts
# before pytest captures stdio.

# Force CPU even when the session environment pins JAX_PLATFORMS=axon/tpu:
# tests must run on a virtual CPU mesh, never over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
# Virtual device count: 2 by default (XLA CPU compile time scales with the
# device count and this box has 2 cores; 2 devices already exercise every
# sharding/collective path).  Set GRAMPLE_TEST_DEVICES=8 for thorough runs —
# the driver's dryrun_multichip separately validates 8-device meshes.
_ndev = os.environ.get("GRAMPLE_TEST_DEVICES", "2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_ndev}"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# UAI benchmark instances: read from the reference checkout when present
# (read-only data files, never code), else skip the golden-data tests.
RES_DIR = os.environ.get("GRAMPLE_RES", "/root/reference/res")


def res_path(name: str) -> str:
    p = os.path.join(RES_DIR, name)
    if not os.path.exists(p):
        pytest.skip(f"benchmark data {name} not available (set GRAMPLE_RES)")
    return p


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
