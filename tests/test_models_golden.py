"""Reference-parity golden tests against REAL checkpoints + reference images.

Re-provision of the reference tier-3 harness (tests/test-models.cpp:8-118):
each test loads a converted GGUF from the models dir, runs the full
user-facing pipeline on a reference input image, saves the result, and
asserts RMS against the reference output image (<= 0.01 on CPU f32, 0.015
on accelerators, matching test-models.cpp:34,50). No checkpoints ship in
this environment, so every test skips cleanly when its files are absent —
the analog of the reference's ``test_skip`` (test-models.cpp:56-58).

Layout (override roots with VISP_TEST_MODELS / VISP_TEST_DATA):
    models/                          *.gguf checkpoints
    tests/data/input/                reference input images
    tests/data/reference/            expected output images
    tests/data/results/              actual outputs (written on every run)
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

from vision_tpu.image import (
    Image,
    ImageFormat,
    image_alpha_composite,
    image_difference_rms,
    image_f32_to_u8,
    image_load,
    image_save,
)

MODELS = Path(os.environ.get("VISP_TEST_MODELS", "models"))
DATA = Path(os.environ.get("VISP_TEST_DATA", "tests/data"))
INPUT = DATA / "input"
REFERENCE = DATA / "reference"
RESULTS = DATA / "results"


def _require(*paths: Path) -> None:
    missing = [str(p) for p in paths if not p.exists()]
    if missing:
        pytest.skip(f"model/reference files not available: {', '.join(missing)}")


def _tolerance() -> float:
    """0.01 for CPU f32 exactness, 0.015 for accelerator numerics
    (reference test-models.cpp:34,50)."""
    from vision_tpu.core.device import BackendType, backend_init

    return 0.01 if backend_init().type & BackendType.cpu else 0.015


def compare_images(result: Image, name: str, tolerance: float | None = None) -> None:
    """(reference compare_images, test-models.cpp:8-19)."""
    ref_path = REFERENCE / name
    _require(ref_path)
    RESULTS.mkdir(parents=True, exist_ok=True)
    image_save(result, RESULTS / name)
    reference = image_load(ref_path)
    rms = image_difference_rms(result, reference)
    tol = tolerance if tolerance is not None else _tolerance()
    assert rms <= tol, f"{name}: rms {rms:.5f} > {tol}"


def test_mobile_sam_golden():
    from vision_tpu.models.mobile_sam import sam_load_model

    model_path = MODELS / "MobileSAM-F16.gguf"
    input_path = INPUT / "cat-and-hat.jpg"
    _require(model_path, input_path)
    model = sam_load_model(str(model_path))
    model.encode(image_load(input_path))
    mask_box = model.compute(box=((180, 110), (505, 330)))
    mask_point = model.compute(point=(200, 300))
    compare_images(mask_box, "mobile_sam-box.png")
    compare_images(mask_point, "mobile_sam-point.png")


def test_birefnet_golden():
    from vision_tpu.models.birefnet import birefnet_compute, birefnet_load_model

    model_path = MODELS / "BiRefNet-lite-F16.gguf"
    input_path = INPUT / "wardrobe.jpg"
    _require(model_path, input_path)
    model = birefnet_load_model(str(model_path))
    output = birefnet_compute(model, image_load(input_path))
    compare_images(output, "birefnet.png")


def test_depth_anything_golden():
    from vision_tpu.models.depth_anything import depthany_compute, depthany_load_model

    model_path = MODELS / "Depth-Anything-V2-Small-F16.gguf"
    input_path = INPUT / "wardrobe.jpg"
    _require(model_path, input_path)
    model = depthany_load_model(str(model_path))
    depth = depthany_compute(model, image_load(input_path))
    output = image_f32_to_u8(depth, ImageFormat.alpha_u8)
    compare_images(output, "depth-anything.png")


def test_migan_golden():
    from vision_tpu.models.migan import migan_compute, migan_load_model

    model_path = MODELS / "MIGAN-512-places2-F16.gguf"
    image_path = INPUT / "bench-image.jpg"
    mask_path = INPUT / "bench-mask.png"
    _require(model_path, image_path, mask_path)
    model = migan_load_model(str(model_path))
    image = image_load(image_path)
    mask = image_load(mask_path)
    output = migan_compute(model, image, mask)
    composited = image_alpha_composite(output, image, mask)
    compare_images(composited, "migan.png")


def test_esrgan_golden():
    from vision_tpu.models.esrgan import esrgan_compute, esrgan_load_model

    model_path = MODELS / "RealESRGAN-x4plus_anime-6B-F16.gguf"
    input_path = INPUT / "vase-and-bowl.jpg"
    _require(model_path, input_path)
    model = esrgan_load_model(str(model_path))
    output = esrgan_compute(model, image_load(input_path))
    compare_images(output, "esrgan.png")


def test_birefnet_dynamic_golden():
    """Two different resolutions through one dynamic model
    (reference test-models.cpp test_birefnet_dynamic)."""
    from vision_tpu.models.birefnet import birefnet_compute, birefnet_load_model

    model_path = MODELS / "BiRefNet-dynamic-F16.gguf"
    input1 = INPUT / "cat-and-hat.jpg"
    input2 = INPUT / "wardrobe.jpg"
    _require(model_path, input1, input2)
    model = birefnet_load_model(str(model_path), dynamic_extent=(1, 1))
    birefnet_compute(model, image_load(input1))
    output2 = birefnet_compute(model, image_load(input2))
    compare_images(output2, "birefnet-dynamic.png", 0.015)
