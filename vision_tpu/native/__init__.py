"""ctypes bindings for the native host-ops library.

The analog of the reference's C ABI + pure-ctypes Python bindings
(src/visp/c-api.cpp, bindings/python/visioncpp/_lib.py): `libvisphost.so`
exports `visp_*` C functions for the host-side hot loops; this module
declares the signatures and marshals numpy arrays. Everything degrades to
the vectorized numpy implementations when the library isn't built
(`make -C vision_tpu/native`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "lib", "build", "nms_native", "box_blur_native", "erosion_native"]

_LIB_PATH = Path(__file__).parent / "libvisphost.so"
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-place."""
    try:
        subprocess.run(
            ["make", "-C", str(Path(__file__).parent)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int)

    lib.visp_version.restype = ctypes.c_int
    lib.visp_get_last_error.restype = ctypes.c_char_p
    lib.visp_u8_to_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int, ctypes.c_int, i32p,
    ]
    lib.visp_f32_to_u8.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    lib.visp_box_blur.argtypes = [f32p, f32p] + [ctypes.c_int] * 4
    lib.visp_erosion_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 3
    lib.visp_tile_merge.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p, f32p] + [ctypes.c_int] * 5
    lib.visp_nms.argtypes = [
        f32p, f32p, i32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p,
    ]
    lib.visp_nms.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def lib():
    return _load()


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def box_blur_native(src: np.ndarray, radius: int) -> np.ndarray | None:
    """(H, W, C) f32 box blur via the native lib, or None if unavailable."""
    l = _load()
    if l is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    h, w, c = src.shape
    dst = np.empty_like(src)
    l.visp_box_blur(_fp(src), _fp(dst), h, w, c, radius)
    return dst


def erosion_native(src: np.ndarray, radius: int) -> np.ndarray | None:
    l = _load()
    if l is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    h, w = src.shape[:2]
    dst = np.empty((h, w), np.float32)
    l.visp_erosion_f32(_fp(src.reshape(h, w)), _fp(dst), h, w, radius)
    return dst


def nms_native(
    boxes: np.ndarray,
    scores: np.ndarray,
    class_ids: np.ndarray,
    iou_thres: float,
    max_wh: int = 7680,
    max_det: int = 300,
) -> list[int] | None:
    l = _load()
    if l is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    cls = np.ascontiguousarray(class_ids, np.int32)
    keep = np.empty(min(len(boxes), max_det), np.int32)
    n = l.visp_nms(
        _fp(boxes), _fp(scores), cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(boxes), iou_thres, max_wh, max_det,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return keep[:n].tolist()
