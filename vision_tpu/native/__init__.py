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

__all__ = [
    "available", "lib", "build", "nms_native", "box_blur_native",
    "erosion_native", "u8_to_f32_native", "f32_to_u8_native", "tile_merge_native",
]

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


def u8_to_f32_native(
    src: np.ndarray,
    dc: int,
    offset=(0.0, 0.0, 0.0, 0.0),
    scale=(1.0, 1.0, 1.0, 1.0),
    tile_offset=(0, 0),
    dst_extent=None,
    chmap=None,
) -> np.ndarray | None:
    """(sh, sw, sc) u8 -> (dh, dw, dc) f32 ``(src/255 + offset) * scale``
    with replicate-padded tiled reads — the native twin of
    image.image_u8_to_f32 (reference image.cpp:215-255). A missing source
    lane reads as 1/255 like the reference u8 load. None if unavailable."""
    l = _load()
    if l is None:
        return None
    src = np.ascontiguousarray(src)
    sh, sw, sc = src.shape
    dw, dh = dst_extent if dst_extent is not None else (sw, sh)

    def _lane4(v, neutral):
        # rgb-only 3-tuples (e.g. the shared IMAGENET_MEAN/STD) get a
        # neutral 4th lane, exactly like image.image_u8_to_f32._lane4
        v = np.asarray(v, np.float32)
        if v.ndim == 1 and v.shape[0] == 3:
            v = np.concatenate([v, np.float32([neutral])])
        return np.ascontiguousarray(np.broadcast_to(v, (4,)))

    off = _lane4(offset, 0.0)
    scl = _lane4(scale, 1.0)
    cm = None
    if chmap is not None:
        cm = np.ascontiguousarray(np.asarray(chmap, np.int32))
        cm = cm.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    dst = np.empty((dh, dw, dc), np.float32)
    l.visp_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, sc,
        _fp(dst), dh, dw, dc, _fp(off), _fp(scl),
        int(tile_offset[0]), int(tile_offset[1]), cm,
    )
    return dst


def f32_to_u8_native(f32x4: np.ndarray, dc: int, scale: float = 1.0, offset: float = 0.0) -> np.ndarray | None:
    """4-lane f32 pixels -> first ``dc`` channels as u8
    ``clamp(v*scale + offset, 0, 1) * 255`` truncating — the native twin of
    image._store_u8 on a load_f32x4 intermediate. None if unavailable."""
    l = _load()
    if l is None:
        return None
    a = np.ascontiguousarray(f32x4, np.float32)
    out = np.empty(a.shape, np.uint8)
    l.visp_f32_to_u8(
        _fp(a), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        a.size, float(scale), float(offset),
    )
    return np.ascontiguousarray(out[:, :, :dc])


def tile_merge_native(
    tile: np.ndarray, blend: np.ndarray, dst: np.ndarray, coord: tuple[int, int]
) -> bool:
    """Accumulate ``tile * blend`` into dst at (x, y) — the native twin of
    the tiling engine's merge (reference image.cpp:655-693; dst must be
    zero-initialized, blend weights normalized). False if unavailable."""
    l = _load()
    if l is None:
        return False
    tile = np.ascontiguousarray(tile, np.float32)
    blend = np.ascontiguousarray(blend, np.float32)
    assert dst.dtype == np.float32 and dst.flags.c_contiguous
    th, tw, c = tile.shape
    dh, dw = dst.shape[:2]
    l.visp_tile_merge(
        _fp(tile), th, tw, _fp(blend), _fp(dst), dh, dw,
        int(coord[0]), int(coord[1]), c,
    )
    return True
