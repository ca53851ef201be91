"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths
(jax.sharding.Mesh over dp/tp axes) compile and execute without TPU hardware,
mirroring how the driver validates `dryrun_multichip`. Numeric parity tests
use float32 on CPU; TPU bf16 behavior is covered by tolerance budgets.
"""

import os

# Force CPU even when the environment preselects the TPU (JAX_PLATFORMS=axon
# is baked into the env and jax may already be imported by sitecustomize, so
# we must go through jax.config, not os.environ): parity tests need
# deterministic f32; TPU numerics are covered by tolerance budgets in the
# golden/bench tier.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _serialize_heavy(request):
    """Tests marked ``heavy`` (8-virtual-device meshes, 1024^2 model traces)
    hold an inter-process file lock: two concurrent ``pytest tests/`` runs
    executing a heavy test simultaneously have been observed to SIGABRT the
    XLA CPU client (NOTES.md). The lock serializes only the heavy tests —
    everything else still overlaps freely across processes."""
    if request.node.get_closest_marker("heavy") is None:
        yield
        return
    import fcntl

    path = os.path.join(os.path.dirname(__file__), ".heavy.lock")
    with open(path, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)
