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

# Persistent XLA compilation cache for the suite (opt out: VISP_TEST_CACHE=0).
# The suite is compile-bound on this class of machine (NOTES.md: 1-core box,
# ~25 min clean); cached programs cut warm reruns to a fraction. Entries are
# keyed by HLO hash, so code changes invalidate automatically. The XLA AOT
# loader logs noisy machine-feature warnings when loading cached CPU programs
# (prefer-no-scatter/gather pseudo-features); they are harmless and pytest's
# capture keeps them out of the report.
if os.environ.get("VISP_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "vision_tpu", "test-xla"
    )
    os.makedirs(_cache_dir, exist_ok=True)
    # Bound the cache by wholesale reset, NOT jax_compilation_cache_max_size:
    # jax's LRU eviction races its own -atime bookkeeping files
    # (FileNotFoundError inside put()), which silently DROPPED every write of
    # the biggest entries (the multi-minute finetune fwd+bwd programs) — the
    # one class of program the cache exists for. Entries are HLO-hash keyed,
    # so code churn grows the dir monotonically; reset when it passes 8 GB
    # (one cold suite rebuilds it in ~25 min).
    _size = sum(
        os.path.getsize(os.path.join(_cache_dir, f))
        for f in os.listdir(_cache_dir)
        if os.path.isfile(os.path.join(_cache_dir, f))
    )
    if _size > 8 * 1024**3:
        import shutil

        shutil.rmtree(_cache_dir)
        os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Run heavy tests LAST, with the mesh tests (test_parallel) at the very
    end: test_parallel's dp-sharded encoder calls jax.clear_caches() (an XLA
    CPU abort mitigation, NOTES.md), which would force every later SAM-using
    test to recompile the 1024^2 programs if it ran mid-suite. The sort is
    stable, so in-file order is preserved within each group."""

    def group(item):
        if item.get_closest_marker("heavy") is None:
            return 0
        return 2 if "test_parallel" in str(item.fspath) else 1

    items.sort(key=group)


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
