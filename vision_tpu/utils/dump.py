"""Golden-tensor dump/compare facility (SURVEY.md §5 'Metrics/logging').

The reference dumps per-layer feature maps to txt for YOLO debugging
(save_features_to_txt, yolov9t.cpp:1649-1711) and diffs them against torch
with scripts/dump_yolov9t_compare.py. Here any model can be run inside a
capture context (ops/debug.py) and the named intermediates dumped as .npy,
then compared dump-to-dump.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["dump_captures", "compare_dumps"]


def dump_captures(captures: dict, out_dir: str | Path) -> list[str]:
    """Save a capture-context dict ({name: array}) as .npy files."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    seen: dict[str, str] = {}
    for name, value in captures.items():
        safe = name.replace("/", "_").replace(".", "_")
        if safe in seen:
            # distinct capture names ('a.b' vs 'a_b') must not collapse
            # onto one file — a silent overwrite makes compare_dumps diff
            # the wrong tensor
            i = 2
            while f"{safe}__{i}" in seen:
                i += 1
            safe = f"{safe}__{i}"
        seen[safe] = name
        path = out / f"{safe}.npy"
        a = value
        if not isinstance(a, np.ndarray) and hasattr(a, "astype") and str(getattr(a, "dtype", "")) == "bfloat16":
            # cast ON DEVICE first: np.asarray on a bf16 device array is the
            # pathologically slow element-conversion D2H path (CLAUDE.md)
            import jax.numpy as jnp

            a = a.astype(jnp.float32)
        np.save(path, np.asarray(a, dtype=np.float32))
        written.append(str(path))
    return written


def compare_dumps(dir_a: str | Path, dir_b: str | Path, rtol=1e-2, atol=1e-3) -> dict[str, dict]:
    """Layer-by-layer diff of two dump directories (the reference's
    dump_yolov9t_compare.py flow). Returns per-tensor stats."""
    dir_a, dir_b = Path(dir_a), Path(dir_b)
    report = {}
    names = sorted(p.name for p in dir_a.glob("*.npy"))
    for name in names:
        pb = dir_b / name
        if not pb.exists():
            report[name] = {"status": "missing_in_b"}
            continue
        a = np.load(dir_a / name)
        b = np.load(pb)
        if a.shape != b.shape:
            report[name] = {"status": "shape_mismatch", "a": a.shape, "b": b.shape}
            continue
        diff = np.abs(a - b)
        ok = bool(np.allclose(a, b, rtol=rtol, atol=atol))
        report[name] = {
            "status": "ok" if ok else "mismatch",
            "max_abs": float(diff.max()),
            "mean_abs": float(diff.mean()),
            "rms": float(np.sqrt((diff**2).mean())),
        }
    for p in dir_b.glob("*.npy"):
        if p.name not in names:
            report[p.name] = {"status": "missing_in_a"}
    return report
