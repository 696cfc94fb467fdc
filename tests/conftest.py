"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; the standard JAX stand-in is
a host-platform device count override (SURVEY.md section 4).  Must be set
before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets 'axon' (TPU)
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
