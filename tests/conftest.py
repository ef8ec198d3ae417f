"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior (data-parallel psum over a Mesh) is tested without real
hardware via XLA's host-platform device-count flag — the standard JAX trick
(SURVEY.md section 4). Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep CPU convolutions deterministic-ish and fast in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
