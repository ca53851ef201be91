"""Golden-output regression tests (reference tier 3, test-models.cpp:22-118).

The reference compares full-pipeline outputs against checked-in golden
images with RMS thresholds. Without downloadable checkpoints, the goldens
here are framework outputs under deterministic random weights (torch-seeded
state dicts) committed as .npz — any numerical regression in the stack
(ops, layouts, resize semantics, fusion) shows up as an RMS drift.

Regenerate after *intentional* changes: GOLDEN_REGEN=1 pytest tests/test_golden.py
"""

import os
from pathlib import Path

import numpy as np
import pytest
import torch

from workbench import input_tensor, make_params, randomize, to_nhwc

GOLDEN_DIR = Path(__file__).parent / "golden"
REGEN = os.environ.get("GOLDEN_REGEN") == "1"
RMS_THRESHOLD = 1e-4  # same-platform f32 determinism budget


def _check(name: str, output: np.ndarray):
    GOLDEN_DIR.mkdir(exist_ok=True)
    path = GOLDEN_DIR / f"{name}.npz"
    output = np.asarray(output, np.float32)
    if REGEN or not path.exists():
        np.savez_compressed(path, output=output)
        if REGEN:
            return
        pytest.skip(f"golden {name} regenerated; re-run to compare")
    golden = np.load(path)["output"]
    assert golden.shape == output.shape, f"{name}: shape {output.shape} vs golden {golden.shape}"
    rms = float(np.sqrt(np.mean((golden - output) ** 2)))
    scale = float(np.sqrt(np.mean(golden**2))) + 1e-8
    assert rms / scale < RMS_THRESHOLD, f"{name}: relative RMS drift {rms / scale:.2e}"


def test_golden_esrgan():
    from test_esrgan import RRDBNet
    from vision_tpu.models.esrgan import EsrganParams, esrgan_generate

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    x = input_tensor(1, 3, 16, 16)
    out = esrgan_generate(make_params(t), to_nhwc(x), EsrganParams(4, 1))
    _check("esrgan", out)


def test_golden_migan():
    from test_migan import TMigan
    from vision_tpu.models.migan import MiganParams, migan_generate

    t = randomize(TMigan())
    x = input_tensor(1, 4, 16, 16)
    out = migan_generate(make_params(t), to_nhwc(x), MiganParams(resolution=16))
    _check("migan", out)


def test_golden_depth_anything():
    from test_depth_anything import TDepthAnything
    from vision_tpu.models.depth_anything import DepthAnythingParams, depthany_predict
    from vision_tpu.models.dino import DinoParams

    t = randomize(TDepthAnything())
    x = input_tensor(1, 3, 56, 70)
    p = DepthAnythingParams(
        dino=DinoParams(patch_size=14, embed_dim=32, n_heads=4, n_layers=4),
        feature_layers=(0, 1, 2, 3),
    )
    out = depthany_predict(make_params(t), to_nhwc(x), p)
    _check("depth_anything", out)


def test_golden_birefnet():
    from test_birefnet import SWIN_TEST, TBirefnet
    from vision_tpu.models.birefnet import BirefnetParams, birefnet_predict

    t = randomize(TBirefnet())
    x = input_tensor(1, 3, 64, 64)
    p = BirefnetParams(image_size=64, image_extent=(64, 64), encoder=SWIN_TEST)
    out = birefnet_predict(make_params(t), to_nhwc(x), p)
    _check("birefnet", out)


def test_golden_yolov9t():
    from test_yolov9t import TYolo
    from vision_tpu.models.yolov9t import Yolov9tParams, yolov9t_forward

    t = randomize(TYolo())
    x = input_tensor(1, 3, 64, 64)
    out = yolov9t_forward(make_params(t), to_nhwc(x), Yolov9tParams(num_classes=4), n_csp=1)
    _check("yolov9t_boxes", out.boxes)
    _check("yolov9t_scores", out.scores)


def test_golden_sam_encoder():
    from test_mobile_sam import TEST_CFG, TEST_TP, TTinyVit, fuse_params
    from vision_tpu.models.mobile_sam import tiny_vit

    t = randomize(TTinyVit(TEST_CFG, 56))
    x = input_tensor(1, 3, 56, 56)
    out = tiny_vit(fuse_params(t), to_nhwc(x), TEST_TP)
    _check("sam_encoder", out)


def test_golden_sam_decoder():
    from test_mobile_sam import TMaskDecoder
    from vision_tpu.core.params import Params
    from vision_tpu.models.mobile_sam import predict_masks
    from workbench import state_dict_to_params

    t = randomize(TMaskDecoder())
    emb = input_tensor(1, 32, 8, 8)
    pe = input_tensor(1, 32, 8, 8, seed=5)
    sparse = input_tensor(1, 2, 32, seed=6)
    dense = input_tensor(32, seed=7)
    store = state_dict_to_params(t.state_dict())
    store["dense_positional_embedding"] = to_nhwc(pe)[0]
    pred = predict_masks(Params(store), to_nhwc(emb), sparse.numpy(), dense.numpy())
    _check("sam_decoder_masks", pred.masks)
    _check("sam_decoder_iou", pred.iou)


def test_golden_sam3_vision():
    from test_sam3 import TVit
    from vision_tpu.models.sam3 import Sam3VitParams, vision_transformer

    t = randomize(TVit())
    x = input_tensor(1, 3, 16, 16)
    vp = Sam3VitParams(image_size=16, patch_size=4, window_size=2, n_layers=3, n_heads=2, global_attn_indexes=(1,))
    out = vision_transformer(make_params(t), to_nhwc(x), vp)
    _check("sam3_vision", out)


def test_golden_manifest_matches():
    """Committed goldens must match their sha256 manifest (drift gate)."""
    import json
    from pathlib import Path

    import hashlib

    manifest_path = GOLDEN_DIR / "manifest.json"
    if not manifest_path.exists():
        pytest.skip("no manifest yet")
    recorded = json.loads(manifest_path.read_text())
    for name, digest in recorded.items():
        p = GOLDEN_DIR / name
        assert p.exists(), f"golden {name} missing"
        assert hashlib.sha256(p.read_bytes()).hexdigest() == digest, f"golden {name} drifted"
