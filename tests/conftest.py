"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths
(jax.sharding.Mesh over dp/tp axes) compile and execute without TPU hardware,
mirroring how the driver validates `dryrun_multichip`. Numeric parity tests
use float32 on CPU; TPU bf16 behavior is covered by tolerance budgets.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
