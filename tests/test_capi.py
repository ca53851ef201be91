"""Model-level C ABI (native/c_api.cpp + capi.py) — the counterpart of the
reference's src/visp/c-api.cpp, driven through ctypes exactly as an
embedding application would: visp_init -> visp_device_init ->
visp_model_load -> visp_model_compute -> destroy, with error-code +
visp_get_last_error discipline."""

import ctypes
import os
from pathlib import Path

import numpy as np
import pytest
import torch

REPO = Path(__file__).resolve().parent.parent
LIB = REPO / "vision_tpu" / "native" / "libvisp_capi.so"

if not LIB.exists():  # build in-place (same on-demand policy as host ops)
    from vision_tpu import native

    native.build()

pytestmark = pytest.mark.skipif(not LIB.exists(), reason="libvisp_capi.so could not be built")


class VispImageView(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("stride", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("data", ctypes.c_void_p),
    ]


def _load_lib():
    lib = ctypes.CDLL(str(LIB))
    lib.visp_get_last_error.restype = ctypes.c_char_p
    lib.visp_init.argtypes = [ctypes.c_char_p]
    lib.visp_device_init.argtypes = [ctypes.c_int32, ctypes.POINTER(ctypes.c_void_p)]
    lib.visp_model_detect_family.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
    lib.visp_model_load.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.visp_model_compute.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.POINTER(VispImageView), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(VispImageView), ctypes.POINTER(ctypes.c_void_p),
    ]
    assert lib.visp_init(str(REPO).encode()) == 1, lib.visp_get_last_error()
    return lib


def _view_from_u8(arr: np.ndarray, fmt: int) -> VispImageView:
    h, w, c = arr.shape
    return VispImageView(
        width=w, height=h, stride=w * c * arr.itemsize, format=fmt,
        data=arr.ctypes.data_as(ctypes.c_void_p).value,
    )


def test_c_api_esrgan_end_to_end(tmp_path):
    from test_esrgan import RRDBNet, _write_gguf
    from workbench import randomize

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    gguf = _write_gguf(tmp_path / "esrgan.gguf", t, 4, 1)

    lib = _load_lib()
    dev = ctypes.c_void_p()
    assert lib.visp_device_init(1, ctypes.byref(dev)) == 1, lib.visp_get_last_error()

    fam = ctypes.c_int32(-1)
    assert lib.visp_model_detect_family(str(gguf).encode(), ctypes.byref(fam)) == 1
    assert fam.value == 4  # esrgan (reference model_family order)

    model = ctypes.c_void_p()
    assert lib.visp_model_load(str(gguf).encode(), dev, -1, ctypes.byref(model)) == 1, (
        lib.visp_get_last_error()
    )

    rgb = np.ascontiguousarray(
        np.random.default_rng(0).integers(0, 256, (20, 24, 3)).astype(np.uint8)
    )
    inputs = (VispImageView * 1)(_view_from_u8(rgb, 3))  # 3 = rgb_u8
    out_view = VispImageView()
    out_data = ctypes.c_void_p()
    ok = lib.visp_model_compute(
        model, 4, inputs, 1, None, 0, ctypes.byref(out_view), ctypes.byref(out_data)
    )
    assert ok == 1, lib.visp_get_last_error()
    assert (out_view.width, out_view.height) == (24 * 4, 20 * 4)
    assert out_view.format == 0  # rgba_u8
    pixels = np.ctypeslib.as_array(
        ctypes.cast(out_view.data, ctypes.POINTER(ctypes.c_uint8)),
        shape=(out_view.height, out_view.stride),
    ).reshape(out_view.height, out_view.width, 4).copy()

    # parity with torch on the same input
    with torch.no_grad():
        y = t(torch.from_numpy(rgb.astype(np.float32) / 255.0).permute(2, 0, 1)[None])
    exp = np.clip(y[0].permute(1, 2, 0).numpy(), 0, 1) * 255
    rms = np.sqrt((((exp - pixels[:, :, :3].astype(np.float32)) / 255) ** 2).mean())
    assert rms < 0.01, rms

    lib.visp_image_destroy(out_data)
    lib.visp_model_destroy(model, 4)
    lib.visp_device_destroy(dev)


def test_c_api_error_reporting(tmp_path):
    lib = _load_lib()
    model = ctypes.c_void_p()
    dev = ctypes.c_void_p()
    assert lib.visp_device_init(1, ctypes.byref(dev)) == 1
    missing = str(tmp_path / "nope.gguf").encode()
    assert lib.visp_model_load(missing, dev, -1, ctypes.byref(model)) == 0
    err = lib.visp_get_last_error().decode()
    # the message must carry the offending path or the OS reason — a
    # generic string would be useless to an embedder
    assert "nope.gguf" in err or "No such file" in err
    lib.visp_device_destroy(dev)


def test_c_api_from_c_program(tmp_path):
    """True embedding: a C program (no host interpreter) initializes Python
    through the shim and drives the ABI."""
    import subprocess
    import sys
    import sysconfig

    src = tmp_path / "main.c"
    src.write_text(
        r'''
#include <stdio.h>
#include <stdint.h>
extern const char* visp_get_last_error(void);
extern int32_t visp_init(const char* dir);
extern int32_t visp_device_init(int32_t type, void** out);
extern int32_t visp_model_load(const char*, const void*, int32_t, void**);
extern int32_t visp_device_type(const void*);
extern void visp_device_destroy(void*);

int main(int argc, char** argv) {
    if (!visp_init(argv[1])) { printf("init failed: %s\n", visp_get_last_error()); return 1; }
    void* dev = 0;
    if (!visp_device_init(1, &dev)) { printf("dev failed: %s\n", visp_get_last_error()); return 1; }
    printf("device type %d\n", visp_device_type(dev));
    void* model = 0;
    if (visp_model_load("/does/not/exist.gguf", dev, -1, &model)) { printf("unexpected ok\n"); return 1; }
    printf("expected error: %s\n", visp_get_last_error());
    visp_device_destroy(dev);
    printf("C-EMBED-OK\n");
    return 0;
}
'''
    )
    exe = tmp_path / "main"
    libdir = REPO / "vision_tpu" / "native"
    subprocess.run(
        ["gcc", str(src), "-o", str(exe), f"-L{libdir}", "-lvisp_capi", f"-Wl,-rpath,{libdir}"],
        check=True,
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([str(exe), str(REPO)], capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "C-EMBED-OK" in r.stdout and "device type 1" in r.stdout, r.stdout


def test_c_api_family_mismatch_rejected(tmp_path):
    """Loading with an explicit wrong family must fail at load time
    (the reference validates family against the file)."""
    from test_esrgan import RRDBNet, _write_gguf
    from workbench import randomize

    gguf = _write_gguf(tmp_path / "es.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1)
    lib = _load_lib()
    dev = ctypes.c_void_p()
    assert lib.visp_device_init(1, ctypes.byref(dev)) == 1
    model = ctypes.c_void_p()
    assert lib.visp_model_load(str(gguf).encode(), dev, 0, ctypes.byref(model)) == 0  # 0 = sam
    assert "esrgan" in lib.visp_get_last_error().decode()
    lib.visp_device_destroy(dev)


def test_c_api_yolov9t_detections_drawn(tmp_path):
    """Family 5 (yolov9t) — an extension past the reference's five
    image->image families: one image in + [conf, iou] permille args,
    annotated image out (the reference exposes YOLO only via its CLI)."""
    from vision_tpu.core.gguf import GGUFWriter
    from vision_tpu.models.random_weights import random_yolov9t_params

    path = tmp_path / "y.gguf"
    w = GGUFWriter(path, "yolov9t")
    w.add("yolov9t.tensor_data_layout", "whcn")
    for k, v in random_yolov9t_params().items():
        w.add_tensor(k, v)
    w.write()

    lib = _load_lib()
    dev = ctypes.c_void_p()
    assert lib.visp_device_init(1, ctypes.byref(dev)) == 1, lib.visp_get_last_error()

    fam = ctypes.c_int32(-1)
    assert lib.visp_model_detect_family(str(path).encode(), ctypes.byref(fam)) == 1
    assert fam.value == 5  # yolov9t

    model = ctypes.c_void_p()
    assert lib.visp_model_load(str(path).encode(), dev, -1, ctypes.byref(model)) == 1, (
        lib.visp_get_last_error()
    )

    rgb = np.ascontiguousarray(
        np.random.default_rng(3).integers(0, 256, (96, 128, 3)).astype(np.uint8)
    )
    inputs = (VispImageView * 1)(_view_from_u8(rgb, 3))  # 3 = rgb_u8
    args = (ctypes.c_int32 * 2)(10, 450)  # conf 0.01, iou 0.45 (permille)
    out_view = VispImageView()
    out_data = ctypes.c_void_p()
    ok = lib.visp_model_compute(
        model, 5, inputs, 1, args, 2, ctypes.byref(out_view), ctypes.byref(out_data)
    )
    assert ok == 1, lib.visp_get_last_error()
    assert (out_view.width, out_view.height) == (128, 96)
    assert out_view.format == 3  # rgb_u8, annotated copy of the input

    # bad arg count is a clean error, not a crash
    bad = (ctypes.c_int32 * 1)(10)
    assert (
        lib.visp_model_compute(
            model, 5, inputs, 1, bad, 1, ctypes.byref(out_view), ctypes.byref(out_data)
        )
        == 0
    )
    assert "yolov9t" in lib.visp_get_last_error().decode()

    lib.visp_image_destroy(out_data)
    lib.visp_model_destroy(model, 5)
    lib.visp_device_destroy(dev)


def test_backend_init_cpu_never_touches_accelerators(tmp_path):
    """A fresh process asking for the CPU backend must not initialize
    accelerator platforms (the axon TPU tunnel can stall a fresh process
    for minutes during outages — NOTES.md): backend_init(cpu) pins
    jax_platforms before first backend init."""
    import subprocess
    import sys

    code = (
        "from vision_tpu.core.device import BackendType, backend_init\n"
        "import vision_tpu.core.device as dd\n"
        "d = backend_init(BackendType.cpu)\n"
        "assert d.type == BackendType.cpu, d\n"
        "assert dd._cpu_pinned, 'first cpu init must pin the process'\n"
        "import jax\n"
        "assert all(x.platform == 'cpu' for x in jax.devices()), jax.devices()\n"
        "print('CPU-PIN-OK')\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # must hold even without the env hint
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=120
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CPU-PIN-OK" in r.stdout


def test_image_from_raw_layouts_and_validation():
    """Marshalling accepts both full-stride and trimmed-last-row payloads
    (the shim copies only the final row's pixel bytes so it never overreads
    a tightly allocated caller buffer) and rejects bad format codes."""
    from vision_tpu.capi import FORMATS, _image_from_raw

    w, h, ch, stride = 3, 4, 3, 16  # rgb_u8 rows padded to 16 bytes
    rng = np.random.default_rng(2)
    full = rng.integers(0, 256, (h, stride), np.uint8)
    fmt_int = FORMATS.index(__import__("vision_tpu.image", fromlist=["ImageFormat"]).ImageFormat.rgb_u8)

    img_full = _image_from_raw(w, h, stride, fmt_int, full.tobytes())
    trimmed = full.tobytes()[: stride * (h - 1) + w * ch]
    img_trim = _image_from_raw(w, h, stride, fmt_int, trimmed)
    np.testing.assert_array_equal(np.asarray(img_full.data), np.asarray(img_trim.data))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="format code"):
        _image_from_raw(w, h, stride, -1, full.tobytes())
    with _pytest.raises(ValueError, match="does not match"):
        _image_from_raw(w, h, stride, fmt_int, full.tobytes()[:-20])
