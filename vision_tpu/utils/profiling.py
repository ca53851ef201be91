"""Tracing/profiling utilities (SURVEY.md §5 'Tracing/profiling').

The reference has a minimal `timer` struct printing per-phase times in the
CLI (src/cli/cli.cpp:203-216). TPU-native additions: a context-manager
timer with the scalar-readback barrier (block_until_ready is a no-op under
tunneled PJRT backends, see NOTES.md) and a `trace` context that captures a
jax.profiler trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["Timer", "trace", "device_barrier"]


def device_barrier(x) -> None:
    """Force completion of device work feeding `x` (scalar readback —
    reliable even where block_until_ready is asynchronous)."""
    import jax.numpy as jnp

    float(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype") else x))


class Timer:
    """Per-phase wall-clock timer (reference cli.cpp timer)."""

    def __init__(self, label: str = "", verbose: bool = True):
        self.label = label
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose and self.label and exc[0] is None:
            print(f"{self.label}: {self.elapsed * 1000:.1f} ms")

    def elapsed_str(self) -> str:
        return f"{self.elapsed * 1000:.1f} ms"


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
