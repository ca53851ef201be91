"""Compute-graph cache — jitted programs keyed on shape buckets.

The reference wraps a ggml_cgraph + allocator in ``compute_graph`` and
rebuilds it lazily whenever the input extent changes (src/visp/ml.cpp:528-641;
rebuild-on-extent-change at src/visp/vision.cpp:110-122). Under XLA the graph
IS the jitted function: tracing+compilation happens per static shape, and
XLA's own jit cache keys on shapes. This module adds the framework-level
policy around that:

  * ``GraphCache`` — explicit per-model cache of compiled executables keyed by
    a user-provided key (typically the padded shape bucket), so models can
    report/limit recompiles like the reference does graph rebuilds.
  * ``shape_bucket`` — snap a dynamic extent to a multiple (BiRefNet's 128,
    Depth-Anything's 14) so nearby resolutions share one executable
    (reference: birefnet.cpp:288-305, depth-anything.cpp:112-117).
"""

from __future__ import annotations

from typing import Callable, Hashable

__all__ = ["GraphCache", "shape_bucket", "snap_to_multiple"]


def snap_to_multiple(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def shape_bucket(extent: tuple[int, int], multiple: int, max_extent: int | None = None) -> tuple[int, int]:
    """Snap (width, height) up to `multiple`, optionally clamped."""
    w = snap_to_multiple(extent[0], multiple)
    h = snap_to_multiple(extent[1], multiple)
    if max_extent is not None:
        if max_extent < multiple:
            # no multiple fits under the cap; rounding UP would silently
            # exceed an HBM-derived budget — the one thing the clamp is for
            from .errors import raise_error

            raise_error(
                "shape_bucket: max_extent {} cannot hold a multiple of {}",
                max_extent, multiple,
            )
        # clamp must STAY a multiple — min() alone breaks the contract when
        # max_extent is not itself a multiple
        cap = (max_extent // multiple) * multiple
        w, h = min(w, cap), min(h, cap)
    return (w, h)


class GraphCache:
    """Lazily-compiled executables per shape key (reference compute_graph +
    the per-model 'rebuild if extent changed' logic in vision.cpp)."""

    def __init__(self, build: Callable[..., Callable], max_entries: int = 8):
        if max_entries < 1:
            from .errors import raise_error

            raise_error("GraphCache needs max_entries >= 1, got {}", max_entries)
        self._build = build
        self._cache: dict[Hashable, Callable] = {}
        self._max = max_entries

    def get(self, key: Hashable, *build_args, **build_kwargs) -> Callable:
        fn = self._cache.pop(key, None)
        if fn is None:
            fn = self._build(*build_args, **build_kwargs)
            # evict AFTER a successful build (a failed build must not cost
            # an entry), oldest-used first (re-insertion keeps recency)
            if len(self._cache) >= self._max:
                self._cache.pop(next(iter(self._cache)))
        self._cache[key] = fn
        return fn

    def clear(self) -> None:
        self._cache.clear()

    def __len__(self) -> int:
        return len(self._cache)
