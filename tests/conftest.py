"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip behavior (data-parallel psum over a Mesh) is tested without real
hardware via XLA's host-platform device-count flag — the standard JAX trick
(SURVEY.md section 4).

Environment quirk: this image's sitecustomize pre-imports jax and registers
the axon TPU plugin at interpreter startup, so env vars set here are too late
for the usual path — instead we set XLA_FLAGS (the CPU client is created
lazily, so the flag still applies) and switch the platform through
jax.config. Standalone runs can equivalently use:
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite re-jits the same tiny programs
# every session on 1 CPU core — caching them across runs cuts wall time.
from fetal_mri_segmentation_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
