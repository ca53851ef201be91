"""Full-pipeline converter-roundtrip parity, one test per model family.

The strongest tier-3 analog this environment permits (reference
tests/test-models.cpp:22-118 runs real checkpoints against golden images;
no checkpoints/egress here): a torch twin with deterministic random weights
is saved as a torch checkpoint, pushed through ``convert_model`` to GGUF,
loaded through the production ``*_load_model().compute()`` path (pre/post
processing and resize included), and compared at the IMAGE level against an
independently-implemented torch-side pipeline (PIL resize + torch forward +
numpy post). RMS thresholds follow the reference model tests
(test-models.cpp:34,50: 0.01 cpu / 0.015 gpu).
"""

import json
import math
import re
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).parent))

from workbench import randomize

from vision_tpu.api import load_model
from vision_tpu.convert.convert import convert_model
from vision_tpu.core.device import BackendType, backend_init
from vision_tpu.image import Image, ImageFormat, image_load_array


def smooth_u8(h, w, c=3, seed=0):
    """Smooth low-frequency test image — resize-method differences between
    the two pipelines (stb Catmull-Rom vs PIL bicubic) stay tiny on smooth
    content, so the comparison measures the model pipeline, not the
    interpolator's tail behavior."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, c), np.float32)
    for ch in range(c):
        fx, fy, ph = rng.uniform(0.5, 2.5, 3)
        img[:, :, ch] = 0.5 + 0.45 * np.sin(
            2 * np.pi * (fx * xs / w + fy * ys / h) + ph * 2 * np.pi
        )
    return (img * 255).astype(np.uint8)


def pil_resize(arr: np.ndarray, extent, mode="bicubic") -> np.ndarray:
    """Torch-side resize (independent of vision_tpu.image): PIL bicubic."""
    from PIL import Image as PILImage

    w, h = extent
    if arr.dtype == np.uint8:
        return np.asarray(PILImage.fromarray(arr).resize((w, h), PILImage.BICUBIC))
    if arr.ndim == 3 and arr.shape[2] == 1:
        out = PILImage.fromarray(arr[:, :, 0], mode="F").resize((w, h), PILImage.BICUBIC)
        return np.asarray(out)[:, :, None]
    if arr.ndim == 2:
        return np.asarray(PILImage.fromarray(arr, mode="F").resize((w, h), PILImage.BICUBIC))
    chans = [
        np.asarray(PILImage.fromarray(arr[:, :, i], mode="F").resize((w, h), PILImage.BICUBIC))
        for i in range(arr.shape[2])
    ]
    return np.stack(chans, axis=2)


def rms(a: np.ndarray, b: np.ndarray) -> float:
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.sqrt(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)))


# ---------------------------------------------------------------------------
# ESRGAN (reference workload: vision.cpp:220-253)
# ---------------------------------------------------------------------------


def test_roundtrip_esrgan(tmp_path):
    from test_esrgan import RRDBNet

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    ckpt = tmp_path / "esrgan.pth"
    torch.save(t.state_dict(), ckpt)
    gguf = convert_model("esrgan", ckpt, tmp_path / "esrgan.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    src = smooth_u8(40, 56)
    ours = model.compute(image_load_array(src))
    assert ours.extent == (56 * 4, 40 * 4)

    with torch.no_grad():
        x = torch.from_numpy(src.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        y = t(x).clamp(0, 1)[0].permute(1, 2, 0).numpy()
    assert rms(ours.data[:, :, :3].astype(np.float32) / 255.0, y) <= 0.01


# ---------------------------------------------------------------------------
# MI-GAN (reference migan_compute, vision.cpp:172-205)
# ---------------------------------------------------------------------------


def test_roundtrip_migan(tmp_path):
    from test_migan import TMigan

    t = randomize(TMigan(res=16, ch=8))
    ckpt = tmp_path / "migan.pth"
    torch.save(t.state_dict(), ckpt)
    gguf = convert_model("migan", ckpt, tmp_path / "migan.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    assert model.p.resolution == 16 and model.p.invert_mask
    src = smooth_u8(16, 16)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 255  # inpaint region (white = hole, invert_mask)
    img = image_load_array(src)
    ours = model.compute(img, image_load_array(mask, ImageFormat.alpha_u8))
    assert ours.extent == img.extent and ours.format == ImageFormat.rgba_u8

    with torch.no_grad():
        rgb = torch.from_numpy(src.astype(np.float32) / 255.0)
        alpha = 1.0 - torch.from_numpy(mask.astype(np.float32) / 255.0)[:, :, None]
        x = torch.cat([alpha - 0.5, alpha * (2 * rgb - 1)], dim=2)
        y = t(x.permute(2, 0, 1)[None])[0].permute(1, 2, 0).numpy()
    expected = np.clip(y * 0.5 + 0.5, 0.0, 1.0)
    assert rms(ours.data[:, :, :3].astype(np.float32) / 255.0, expected) <= 0.01
    # alpha channel = the (uninverted) mask (reference vision.cpp:183-203)
    assert np.array_equal(ours.data[:, :, 3], mask)


# ---------------------------------------------------------------------------
# Depth-Anything (reference depthany_compute, vision.cpp:137-168)
# ---------------------------------------------------------------------------


def test_roundtrip_depth_anything(tmp_path):
    from test_depth_anything import TDepthAnything

    t = randomize(TDepthAnything())
    ckpt = tmp_path / "da.pth"
    torch.save(t.state_dict(), ckpt)
    gguf = convert_model("depth-anything", ckpt, tmp_path / "da.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    src = smooth_u8(100, 128)
    img = image_load_array(src)
    ours = model.compute(img)
    assert ours.extent == img.extent and ours.format == ImageFormat.alpha_f32

    # torch-side pipeline: snap extent, PIL resize, ImageNet normalize,
    # forward, min-max normalize, PIL resize back
    from vision_tpu.models.depth_anything import depthany_image_extent

    extent = depthany_image_extent(img.extent, model.p)
    resized = pil_resize(src, extent)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (resized.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        depth = t(torch.from_numpy(x).permute(2, 0, 1)[None])[0, 0].numpy()
    lo, hi = depth.min(), depth.max()
    depth = (depth - lo) / max(hi - lo, 1e-12)
    expected = pil_resize(depth.astype(np.float32), img.extent)
    assert rms(np.asarray(ours.data)[:, :, 0], expected) <= 0.01


# ---------------------------------------------------------------------------
# YOLOv9t (reference run_yolov9t, inference_yolov9t.cpp:301-412)
# ---------------------------------------------------------------------------


def test_roundtrip_yolov9t(tmp_path):
    from test_yolov9t import TYolo, make_anchors

    t = randomize(TYolo())
    ckpt = tmp_path / "yolo.pth"
    torch.save(t.state_dict(), ckpt)
    gguf = convert_model("yolov9t", ckpt, tmp_path / "yolo.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    # config detected from tensor shapes (width-reduced twin: nc=4, n_csp=1)
    assert model.p.num_classes == 4 and model.p.n_csp == 1

    src = smooth_u8(96, 128)
    img = image_load_array(src)
    dets = model.compute(img, conf_thres=0.35)
    assert len(dets) > 0

    # torch-side pipeline: letterbox (replicated independently) -> forward
    # -> candidate grid; every returned detection must coincide with a torch
    # candidate of the same class within float tolerance after the same
    # letterbox undo. (Full NMS equivalence is not asserted — with random
    # weights the scores tie and the keep-order is not deterministic across
    # frameworks; coordinate + score agreement of the kept set is.)
    size = model.p.input_size
    gain = min(size / 96, size / 128)
    nw, nh = round(128 * gain), round(96 * gain)
    dw, dh = (size - nw) / 2, (size - nh) / 2
    resized = pil_resize(src, (nw, nh))
    canvas = np.full((size, size, 3), 114, np.uint8)
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    canvas[top : top + nh, left : left + nw] = resized
    with torch.no_grad():
        boxes, scores = t(torch.from_numpy(canvas.astype(np.float32) / 255.0).permute(2, 0, 1)[None])
    boxes, scores = boxes[0].numpy(), scores[0].numpy()
    # undo letterbox on the torch candidates (reference scale_boxes semantics)
    undone = boxes.copy()
    undone[:, [0, 2]] = (undone[:, [0, 2]] - dw) / gain
    undone[:, [1, 3]] = (undone[:, [1, 3]] - dh) / gain
    undone[:, [0, 2]] = undone[:, [0, 2]].clip(0, 128)
    undone[:, [1, 3]] = undone[:, [1, 3]].clip(0, 96)

    for d in dets:
        db = np.array([d.x1, d.y1, d.x2, d.y2], np.float32)
        dist = np.abs(undone - db).max(axis=1)
        j = int(np.argmin(dist))
        assert dist[j] < 1.5, f"detection {db} has no torch candidate (min dist {dist[j]})"
        assert abs(scores[j, d.class_id] - d.confidence) < 5e-3


# ---------------------------------------------------------------------------
# MobileSAM (reference sam_load_model/sam_encode/sam_compute, vision.cpp:26-95)
# ---------------------------------------------------------------------------

SAM_CFG = [  # production TinyViT-5M (reference mobile-sam.h:16-38)
    {"dim": 64, "depth": 2, "res": 256},
    {"dim": 128, "depth": 2, "res": 128, "heads": 4, "window": 7},
    {"dim": 160, "depth": 6, "res": 64, "heads": 5, "window": 14},
    {"dim": 320, "depth": 2, "res": 64, "heads": 10, "window": 7},
]


def build_sam_checkpoint(path):
    """Torch-twin MobileSAM checkpoint at production TinyViT-5M size.

    Saves to ``path`` and returns ``(enc, dec, gaussian)`` for torch-side
    reference pipelines. Shared by the roundtrip and quant-residency tests.
    """
    from test_mobile_sam import TMaskDecoder, TTinyVit

    torch.manual_seed(0)
    enc = TTinyVit(SAM_CFG, 1024)
    # production 256-channel neck (the twin default is the unit-test size)
    enc.neck = nn.ModuleList([
        nn.Conv2d(320, 256, 1, bias=False), nn.LayerNorm(256),
        nn.Conv2d(256, 256, 3, padding=1, bias=False), nn.LayerNorm(256),
    ])
    enc = randomize(enc)
    dec = randomize(TMaskDecoder(dim=256, up1=64, up2=32), seed=11)
    rng = np.random.default_rng(3)
    gaussian = rng.standard_normal((2, 128)).astype(np.float32)

    ckpt = {}
    for k, v in enc.state_dict().items():
        ckpt["image_encoder." + k] = v
    for k, v in dec.state_dict().items():
        k = (
            k.replace("cross_attn_t2i", "cross_attn_token_to_image")
            .replace("cross_attn_i2t", "cross_attn_image_to_token")
            .replace("final_attn_t2i", "final_attn_token_to_image")
        )
        ckpt["mask_decoder." + k] = v
    ckpt["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = torch.from_numpy(gaussian)
    for i in range(4):
        ckpt[f"prompt_encoder.point_embeddings.{i}.weight"] = torch.from_numpy(
            (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)
        )
    ckpt["prompt_encoder.not_a_point_embed.weight"] = torch.from_numpy(
        (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)
    )
    ckpt["prompt_encoder.no_mask_embed.weight"] = torch.from_numpy(
        (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)
    )
    torch.save(ckpt, path)
    return enc, dec, gaussian, ckpt


@pytest.mark.slow
@pytest.mark.heavy
def test_roundtrip_mobile_sam(tmp_path):
    path = tmp_path / "mobile_sam.pth"
    enc, dec, gaussian, ckpt = build_sam_checkpoint(path)
    gguf = convert_model("sam", path, tmp_path / "sam.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    src = smooth_u8(200, 256)
    img = image_load_array(src)
    model.encode(img)
    point = (128, 100)
    ours = model.compute(point=point)
    assert ours.extent == img.extent and ours.format == ImageFormat.alpha_u8

    # --- torch-side pipeline (independent pre/post) ---
    scale = 1024.0 / 256.0
    resized = pil_resize(src, (1024, 800))
    padded = np.pad(resized, ((0, 224), (0, 0), (0, 0)), mode="edge")
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (padded.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        embed = enc(torch.from_numpy(x).permute(2, 0, 1)[None])  # NHWC out
    embed_nchw = embed.permute(0, 3, 1, 2)

    # prompt: reference coord transform + random-Fourier PE
    def tcoord(v):
        return 2.0 * ((v * scale + 0.5) / 1024.0) - 1.0

    c = np.array([[tcoord(point[0]), tcoord(point[1])]], np.float32)
    proj = (c @ gaussian) * (2 * np.pi)
    pe_pt = np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)
    fg = pe_pt + ckpt["prompt_encoder.point_embeddings.1.weight"].numpy()
    sparse = np.concatenate([fg, ckpt["prompt_encoder.not_a_point_embed.weight"].numpy()], 0)

    # dense image PE baked from the gaussian (reference convert.py:265-282)
    size = 64
    ye = (np.cumsum(np.ones((size, size)), 0) - 0.5) / size
    xe = (np.cumsum(np.ones((size, size)), 1) - 0.5) / size
    coords = np.stack([xe, ye], -1)
    dproj = (2 * coords - 1) @ gaussian * (2 * np.pi)
    dense_pe = np.concatenate([np.sin(dproj), np.cos(dproj)], -1).astype(np.float32)

    with torch.no_grad():
        masks, iou = dec(
            embed_nchw,
            torch.from_numpy(dense_pe).permute(2, 0, 1)[None],
            torch.from_numpy(sparse)[None],
            ckpt["prompt_encoder.no_mask_embed.weight"][0],
        )
    best = int(torch.argmax(iou[0, :3]))
    m = masks[0, best][None, None]
    m = F.interpolate(m, (1024, 1024), mode="bilinear", align_corners=False)
    m = m[:, :, :800, :1024]
    m = F.interpolate(m, (200, 256), mode="bilinear", align_corners=False)[0, 0].numpy()
    expected = (m > 0.0).astype(np.uint8) * 255

    agree = float(np.mean(np.asarray(ours.data)[:, :, 0] == expected))
    assert agree >= 0.995, f"mask agreement {agree}"


# ---------------------------------------------------------------------------
# BiRefNet (reference birefnet_compute, vision.cpp:97-135)
# ---------------------------------------------------------------------------


def _biref_ckpt_names(sd):
    """Twin (converted) names -> original-checkpoint names, such that the
    converter's renames (convert.py convert_birefnet) map them back."""
    out = {}
    for k, v in sd.items():
        n = k.replace("decoder.block", "decoder.decoder_block")
        n = re.sub(r"(aspp(?:1|_deforms\.\d+))\.conv\.", r"\1.atrous_conv.", n)
        n = n.replace(".atrous_conv.offset.", ".atrous_conv.offset_conv.")
        n = n.replace(".atrous_conv.modulator.", ".atrous_conv.modulator_conv.")
        n = n.replace(".atrous_conv.conv.", ".atrous_conv.regular_conv.")
        out[n] = v
    return out


@pytest.mark.slow
@pytest.mark.heavy
def test_roundtrip_birefnet(tmp_path):
    from test_birefnet import TBirefnet

    t = randomize(TBirefnet())
    ckpt = _biref_ckpt_names(t.state_dict())
    # "dynamic" in the filename selects image_size=-1 (converter contract)
    path = tmp_path / "birefnet-dynamic.pth"
    torch.save(ckpt, path)
    gguf = convert_model("birefnet", path, tmp_path / "birefnet.gguf")

    model = load_model(str(gguf), backend_init(BackendType.cpu))
    assert model.p.image_size == -1
    assert model.p.encoder.embed_dim == 8  # custom config detected
    src = smooth_u8(64, 64)
    img = image_load_array(src)
    ours = model.compute(img)
    assert ours.extent == img.extent and ours.format == ImageFormat.alpha_u8

    # torch side: resize to the dynamic extent (multiple of 128 -> 128),
    # normalize, forward, resize the sigmoid mask back
    resized = pil_resize(src, (128, 128))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (resized.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        mask = t(torch.from_numpy(x).permute(2, 0, 1)[None])[0, 0].numpy()
    expected = pil_resize(mask.astype(np.float32), (64, 64))
    assert rms(np.asarray(ours.data)[:, :, 0].astype(np.float32) / 255.0, expected) <= 0.015


# ---------------------------------------------------------------------------
# SAM3 (WIP scope: tokenizer + text + vision features, reference sam3.h)
# ---------------------------------------------------------------------------


def test_roundtrip_sam3(tmp_path):
    from test_sam3 import TClipText, TFpnLayer, TVit

    from vision_tpu.models.sam3 import Sam3VitParams, sam3_load_model

    # tokenizer files next to the checkpoint (converter contract)
    tokens = ["<unk>", "a", "b", "c", "a</w>", "b</w>", "c</w>", "ab", "ab</w>",
              "abc</w>", "1</w>", "!</w>", "<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "vocab.json").write_text(json.dumps({t: i for i, t in enumerate(tokens)}))
    (tmp_path / "merges.txt").write_text("#version\na b\nab c</w>\na b</w>\n")
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "bos_token_id": 12, "eos_token_id": 13, "pad_token_id": 13,
        "unk_token_id": 0, "model_max_length": 8,
    }))

    dim, fpn = 8, 4
    text = randomize(TClipText(vocab=14, dim=16, heads=4, layers=2, max_pos=8))
    vit = randomize(TVit(dim=dim, heads=2, layers=3, patch=4, pretrain_grid=4,
                         window=2, glob=(1,), img=16), seed=5)
    neck = [randomize(TFpnLayer(dim, fpn, i), seed=20 + i) for i in range(4)]

    ckpt = {}
    for k, v in text.state_dict().items():
        ckpt["detector_model.text_encoder.text_model." + k] = v
    for k, v in vit.state_dict().items():
        ckpt["detector_model.vision_encoder.backbone." + k] = v
    for i, lay in enumerate(neck):
        for k, v in lay.state_dict().items():
            ckpt[f"detector_model.vision_encoder.neck.fpn_layers.{i}." + k] = v
    path = tmp_path / "sam3.pth"
    torch.save(ckpt, path)
    gguf = convert_model("sam3", path, tmp_path / "sam3.gguf")

    vp = Sam3VitParams(image_size=16, patch_size=4, window_size=2, n_layers=3,
                       n_heads=2, global_attn_indexes=(1,))
    model = sam3_load_model(str(gguf), backend_init(BackendType.cpu))
    # reduced vision config is explicit (production defaults otherwise)
    from vision_tpu.models.sam3 import Sam3Model

    model = Sam3Model(model.params, model.tokenizer, model.max_tokens, model.device, vp=vp)

    # text: tokenizer + encoder features vs the torch twin on the same ids
    toks = model.tokenizer.tokenize("ab c!", model.max_tokens)
    ours_text = np.asarray(model.encode_text("ab c!"))
    with torch.no_grad():
        expected_text = text(
            torch.from_numpy(toks.token_ids[None]), torch.from_numpy(toks.attention_mask)
        ).numpy()
    assert rms(ours_text, expected_text) <= 1e-4

    # vision: fpn feature parity on a 16x16 input (no resize on either side)
    src = smooth_u8(16, 16)
    feats = model.encode_vision(image_load_array(src))
    x = (src.astype(np.float32) / 255.0 - 0.5) * 2.0
    with torch.no_grad():
        trunk = vit(torch.from_numpy(x).permute(2, 0, 1)[None])  # NHWC
        trunk_nchw = trunk.permute(0, 3, 1, 2)
        for i in range(4):
            exp = neck[i](trunk_nchw).permute(0, 2, 3, 1).numpy()
            got = np.asarray(feats[i])
            assert rms(got, exp) <= 1e-3, f"fpn level {i}"
