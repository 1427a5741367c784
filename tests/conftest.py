"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first), so the
multi-device sharding paths are testable without TPU hardware — the
strategy SURVEY.md §4 calls out as the gap to add over the reference's
test suite.
"""

import os
import sys

# Force CPU even when the session environment pins JAX_PLATFORMS=axon/tpu:
# tests must run on the virtual 8-device CPU mesh, never over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
