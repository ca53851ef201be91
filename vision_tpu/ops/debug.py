"""Capture-by-name debugging facility.

TPU-native analog of the reference's ``named()`` tensor naming + the
workbench's Captures mechanism (tests/workbench.cpp:718-724,
tests/workbench.py:137-206): model code tags intermediate values with their
dotted module name; when a capture context is active (parity tests, --dump
debugging), tagged values are recorded. Outside a context it is a no-op, so
jitted production code pays nothing.
"""

from __future__ import annotations

import contextlib
from typing import Any

__all__ = ["capture", "capture_context", "capturing"]

_active: list[dict[str, Any]] = []


def capture(name: str, value):
    """Record ``value`` under ``name`` if a capture context is active."""
    if _active:
        _active[-1][name] = value
    return value


def capturing() -> bool:
    return bool(_active)


@contextlib.contextmanager
def capture_context():
    sink: dict[str, Any] = {}
    _active.append(sink)
    try:
        yield sink
    finally:
        _active.pop()
