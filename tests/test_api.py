"""High-level API, converter, and CLI tests (reference analogs: A1-A6 of
SURVEY.md §2.6 and the converter contract T1)."""

import numpy as np
import pytest
import torch

from vision_tpu.api import ModelFamily, load_model, model_detect_family
from vision_tpu.convert.convert import build_attention_bias_indices, convert_model
from vision_tpu.core.gguf import GGUFFile, GGUFWriter
from vision_tpu.image import ImageFormat, image_load_array, image_save

from workbench import randomize


def _write_min_gguf(path, arch):
    w = GGUFWriter(path, arch)
    w.add(f"{arch}.dummy", 1)
    w.write()
    return str(path)


def test_model_detect_family(tmp_path):
    assert model_detect_family(_write_min_gguf(tmp_path / "a.gguf", "mobile-sam")) == ModelFamily.sam
    assert model_detect_family(_write_min_gguf(tmp_path / "b.gguf", "birefnet")) == ModelFamily.birefnet
    assert model_detect_family(_write_min_gguf(tmp_path / "c.gguf", "esrgan")) == ModelFamily.esrgan
    assert model_detect_family(_write_min_gguf(tmp_path / "d.gguf", "depthanything")) == ModelFamily.depth_anything
    with pytest.raises(Exception):
        model_detect_family(_write_min_gguf(tmp_path / "e.gguf", "unknown-arch"))


def test_convert_esrgan_and_load(tmp_path):
    """torch checkpoint -> convert_model -> generic load_model -> compute."""
    from test_esrgan import RRDBNet

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    ckpt = tmp_path / "esrgan.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("esrgan", ckpt, tmp_path / "esrgan.gguf")
    f = GGUFFile(out)
    assert f.arch == "esrgan"
    assert f.get_int("esrgan.scale") == 4
    assert f.get_int("esrgan.block_count") == 1
    assert f.tensor_layout == "whcn"
    assert len(f.conv2d_weight_indices()) > 0

    from vision_tpu.core.device import BackendType, backend_init

    model = load_model(str(out), backend_init(BackendType.cpu))
    img = image_load_array(np.random.default_rng(0).integers(0, 256, (24, 32, 3)).astype(np.uint8))
    result = model.compute(img, tile_size=32, batch=1)
    assert result.extent == (128, 96)


def test_to_numpy_widens_unsupported_dtypes():
    """bool / unsigned-int checkpoint buffers widen to the smallest signed
    GGUF-writable type (value-preserving) instead of aborting conversion;
    supported integers and floats keep their path."""
    from vision_tpu.convert.convert import _to_numpy
    from vision_tpu.core.gguf import ggml_type_of

    cases = [
        (torch.tensor([True, False]), np.int8, [1, 0]),
        (torch.tensor([0, 255], dtype=torch.uint8), np.int16, [0, 255]),
        (torch.tensor([7], dtype=torch.int64), np.int64, [7]),
        (torch.tensor([1.5], dtype=torch.float16), np.float32, [1.5]),
    ]
    for t, want_dtype, want_vals in cases:
        a = _to_numpy(t)
        assert a.dtype == np.dtype(want_dtype)
        ggml_type_of(a)  # must be writable
        assert a.tolist() == want_vals


def test_convert_f16(tmp_path):
    from test_esrgan import RRDBNet

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    ckpt = tmp_path / "e.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("esrgan", ckpt, tmp_path / "e16.gguf", float_type="f16")
    f = GGUFFile(out)
    from vision_tpu.core.gguf import GGMLType

    assert f.tensors["model.0.weight"].ggml_type == GGMLType.F16
    assert f.metadata["general.file_type"] == 1


def test_convert_sam_special_tensors(tmp_path):
    """attention_biases indexing, BN fusion, dense PE baking."""
    sd = {}
    g = torch.Generator().manual_seed(0)
    # a Conv2d_BN pair
    sd["image_encoder.patch_embed.seq.0.c.weight"] = torch.randn(8, 3, 3, 3, generator=g)
    sd["image_encoder.patch_embed.seq.0.bn.weight"] = torch.rand(8, generator=g) + 0.5
    sd["image_encoder.patch_embed.seq.0.bn.bias"] = torch.randn(8, generator=g)
    sd["image_encoder.patch_embed.seq.0.bn.running_mean"] = torch.randn(8, generator=g)
    sd["image_encoder.patch_embed.seq.0.bn.running_var"] = torch.rand(8, generator=g) + 0.5
    # attention biases with 4 heads -> resolution 7
    sd["image_encoder.layers.1.blocks.0.attn.attention_biases"] = torch.randn(4, 25 * 7 - 126 + 28, generator=g)
    # gaussian matrix
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = torch.randn(2, 16, generator=g)
    ckpt = tmp_path / "sam.pth"
    torch.save(sd, ckpt)
    out = convert_model("sam", ckpt, tmp_path / "sam.gguf")
    f = GGUFFile(out)
    names = f.tensor_names()
    assert "enc.patch_embed.seq.0.c.weight" in names
    assert "enc.patch_embed.seq.0.c.bias" in names
    assert not any("bn" in n for n in names)
    biased = f.tensor("enc.layers.1.blocks.0.attn.attention_biases_indexed")
    assert biased.shape == (4, 49, 49)
    pe = f.tensor("dec.dense_positional_embedding")
    assert pe.shape == (64, 64, 32)
    # fused conv matches manual fusion
    w = f.tensor("enc.patch_embed.seq.0.c.weight")
    scale = (sd["image_encoder.patch_embed.seq.0.bn.weight"] /
             torch.sqrt(sd["image_encoder.patch_embed.seq.0.bn.running_var"] + 1e-5))
    expected = sd["image_encoder.patch_embed.seq.0.c.weight"] * scale[:, None, None, None]
    np.testing.assert_allclose(w, expected.numpy(), atol=1e-6)


def test_convert_sam_prefused_local_conv(tmp_path):
    """A checkpoint whose local_conv BN was already folded (no bn keys)
    must still write the weight in cwhn layout — the loader un-permutes
    local_conv unconditionally (review r4c: the fallthrough wrote torch
    layout, silently mis-laying-out the depthwise kernel)."""
    g = torch.Generator().manual_seed(1)
    lw = torch.randn(8, 1, 3, 3, generator=g)  # depthwise (C,1,kH,kW)
    sd = {
        "image_encoder.layers.1.blocks.0.local_conv.c.weight": lw,
        "image_encoder.layers.1.blocks.0.local_conv.c.bias": torch.randn(8, generator=g),
    }
    ckpt = tmp_path / "sam_fused.pth"
    torch.save(sd, ckpt)
    out = convert_model("sam", ckpt, tmp_path / "sam_fused.gguf")
    f = GGUFFile(out)
    stored = f.tensor("enc.layers.1.blocks.0.local_conv.c.weight")
    # cwhn storage: (C,1,kH,kW) -> (kH,kW,1,C)
    assert stored.shape == (3, 3, 1, 8)
    np.testing.assert_allclose(stored, lw.numpy().transpose(2, 3, 1, 0), atol=0)
    np.testing.assert_allclose(
        f.tensor("enc.layers.1.blocks.0.local_conv.c.bias"),
        sd["image_encoder.layers.1.blocks.0.local_conv.c.bias"].numpy(), atol=0,
    )


def test_cli_esrgan(tmp_path, monkeypatch):
    """CLI end-to-end smoke test (reference A5)."""
    from test_esrgan import RRDBNet, _write_gguf

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    model_path = _write_gguf(tmp_path / "esrgan.gguf", t, 4, 1)
    img = image_load_array(np.random.default_rng(0).integers(0, 256, (20, 24, 3)).astype(np.uint8))
    inp = tmp_path / "in.png"
    image_save(img, inp)
    outp = tmp_path / "out.png"

    from vision_tpu.cli import main

    rc = main(["esrgan", "-m", str(model_path), "-i", str(inp), "-o", str(outp), "-b", "cpu", "--tile", "32"])
    assert rc == 0
    from vision_tpu.image import image_load

    out = image_load(outp)
    assert out.extent == (96, 80)


def test_cli_missing_model(tmp_path):
    from vision_tpu.cli import main

    rc = main(["esrgan", "-m", "nonexistent.gguf", "-i", "x.png", "-b", "cpu"])
    assert rc == 1


def test_convert_depth_anything_and_load(tmp_path):
    """torch HF-style checkpoint -> convert -> depthany_load_model -> compute."""
    from test_depth_anything import TDepthAnything
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.depth_anything import depthany_load_model

    t = randomize(TDepthAnything())
    ckpt = tmp_path / "da.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("depth-anything", ckpt, tmp_path / "da.gguf")
    f = GGUFFile(out)
    assert f.get_int("dino.patch_size") == 14
    assert f.get_int("dino.embed_dim") == 32
    assert f.get_int("dino.n_layers") == 4
    assert f.get_array("depthanything.feature_layers") == [0, 1, 2, 3]

    model = depthany_load_model(str(out), backend_init(BackendType.cpu))
    img = image_load_array(np.random.default_rng(1).integers(0, 256, (80, 100, 3)).astype(np.uint8))
    depth = model.compute(img)
    assert depth.extent == (100, 80)
    assert depth.format == ImageFormat.alpha_f32
    a = depth.data
    # normalized at inference extent; resizing back can soften the extremes
    assert 0.0 <= float(a.min()) <= float(a.max()) <= 1.0
    assert float(a.max()) > float(a.min())

    # parity vs direct torch->jax path at the model's inference extent
    from vision_tpu.models.depth_anything import (
        DepthAnythingParams, depthany_image_extent, depthany_predict,
    )
    from vision_tpu.models.dino import DinoParams
    from workbench import make_params
    from vision_tpu.image import image_scale, image_u8_to_f32

    p = DepthAnythingParams(
        dino=DinoParams(14, 32, 4, 4), feature_layers=(0, 1, 2, 3)
    )
    extent = depthany_image_extent(img.extent, p)
    resized = image_scale(img, extent)
    x = image_u8_to_f32(
        resized, ImageFormat.rgb_f32,
        offset=(-0.485, -0.456, -0.406, 0.0),
        scale=(1 / 0.229, 1 / 0.224, 1 / 0.225, 1.0),
    )
    direct = np.asarray(depthany_predict(make_params(t), x.data[None], p))[0]
    loaded = np.asarray(
        model._fn(extent)(model.params, np.asarray(resized.data[None]))
    )[0]
    np.testing.assert_allclose(loaded, direct, atol=1e-3, rtol=1e-2)


def test_convert_migan_and_load(tmp_path):
    """MI-GAN checkpoint -> convert -> migan_load_model -> compute."""
    from test_migan import TMigan
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.migan import migan_load_model

    t = randomize(TMigan())
    ckpt = tmp_path / "migan.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("migan", ckpt, tmp_path / "migan.gguf")
    f = GGUFFile(out)
    assert f.get_int("migan.image_size") == 16

    model = migan_load_model(str(out), backend_init(BackendType.cpu))
    rng = np.random.default_rng(2)
    img = image_load_array(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    mask = image_load_array(np.full((16, 16, 1), 255, np.uint8))
    result = model.compute(img, mask)
    assert result.extent == (16, 16)
    assert result.format == ImageFormat.rgba_u8
    assert (result.data[:, :, 3] == 255).all()  # alpha from mask


def test_convert_yolov9t_and_load(tmp_path):
    """YOLO checkpoint (conv+scale-shift bn) -> convert -> model -> detect."""
    from test_yolov9t import TYolo
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams
    from vision_tpu.core.weights import load_weights
    from vision_tpu.core.gguf import model_load

    t = randomize(TYolo())
    ckpt = tmp_path / "yolo.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("yolov9t", ckpt, tmp_path / "yolo.gguf")
    f = GGUFFile(out)
    assert f.arch == "yolov9t"
    assert "model.0.conv.weight" in f.tensor_names()
    assert "model.0.bn.weight" in f.tensor_names()

    dev = backend_init(BackendType.cpu)
    params = load_weights(model_load(str(out)), dev)
    # width-reduced test model: n_csp=1, nc=4 -> drive yolov9t_forward directly
    from vision_tpu.core.params import Params
    from vision_tpu.models.yolov9t import yolov9t_forward, letterbox, non_max_suppression, scale_boxes, draw_detections
    from vision_tpu.image import image_load_array

    img = image_load_array(np.random.default_rng(3).integers(0, 256, (48, 64, 3)).astype(np.uint8))
    arr, gain, dw, dh = letterbox(img, 64)
    out_det = yolov9t_forward(Params(params), (arr[None].astype(np.float32) / 255.0), Yolov9tParams(num_classes=4), n_csp=1)
    boxes = np.asarray(out_det.boxes)[0]
    scores = np.asarray(out_det.scores)[0]
    dets = non_max_suppression(boxes, scores, conf_thres=0.01)
    scale_boxes(dets, img.extent, gain, dw, dh)
    annotated = draw_detections(img, dets[:5])
    assert annotated.extent == img.extent


def test_sam_model_end_to_end():
    """Full SamModel: random production weights, encode + point & box prompts
    (reference sam hero path, vision.cpp:24-95) on CPU."""
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.mobile_sam import SamModel, SamParams, fixup_weights
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.image import image_load_array

    dev = backend_init(BackendType.cpu)
    params = {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}
    model = SamModel(params, SamParams(), dev)
    img = image_load_array(np.random.default_rng(4).integers(0, 256, (200, 300, 3)).astype(np.uint8))
    model.encode(img)
    assert model.embed.shape == (1, 64, 64, 256)
    mask = model.compute(point=(150, 100))
    assert mask.extent == (300, 200)
    assert mask.format == ImageFormat.alpha_u8
    mask2 = model.compute(box=((50, 50), (250, 150)))
    assert mask2.extent == (300, 200)


def test_convert_from_safetensors(tmp_path):
    """Converter consumes .safetensors checkpoints (reference load_model,
    convert.py:100-106)."""
    from safetensors.torch import save_file

    from test_esrgan import RRDBNet

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    ckpt = tmp_path / "esrgan.safetensors"
    save_file(t.state_dict(), str(ckpt))
    out = convert_model("esrgan", ckpt, tmp_path / "st.gguf")
    f = GGUFFile(out)
    assert f.get_int("esrgan.block_count") == 1
    assert "model.0.weight" in f.tensor_names()


def test_convert_sam3_tokenizer_roundtrip(tmp_path):
    """sam3 conversion (reference convert.py:288-351): tokenizer files ->
    GGUF string arrays -> clip_tokenizer_init -> tokenize; weight renames
    applied, text_projection dropped."""
    import json

    from vision_tpu.core.gguf import model_load
    from vision_tpu.models.sam3 import clip_tokenizer_init

    tokens = ["<unk>", "a", "b", "c", "a</w>", "b</w>", "c</w>", "ab", "ab</w>",
              "abc</w>", "1</w>", "!</w>", "<|startoftext|>", "<|endoftext|>"]
    (tmp_path / "vocab.json").write_text(json.dumps({t: i for i, t in enumerate(tokens)}))
    (tmp_path / "merges.txt").write_text("#version\na b\nab c</w>\na b</w>\n")
    (tmp_path / "tokenizer_config.json").write_text(json.dumps({
        "bos_token_id": 12, "eos_token_id": 13, "pad_token_id": 13,
        "unk_token_id": 0, "model_max_length": 8,
    }))
    sd = {
        "detector_model.vision_encoder.backbone.layer_norm.weight": torch.ones(4),
        "detector_model.text_encoder.embeddings.token_embedding.weight": torch.zeros(14, 4),
        "detector_model.text_encoder.text_projection.weight": torch.zeros(4, 4),
        "detector_model.mask_decoder.cross_attn_image_to_token.q_proj.weight": torch.zeros(4, 4),
    }
    ckpt = tmp_path / "sam3.pth"
    torch.save(sd, ckpt)
    out = convert_model("sam3", ckpt, tmp_path / "sam3.gguf")

    f = model_load(str(out))
    assert f.arch == "sam3"
    names = f.tensor_names()
    assert "det.ve.backbone.layer_norm.weight" in names
    assert "det.te.embeddings.token_embedding.weight" in names
    assert "det.decoder.cross_attn_i2t.q_proj.weight" in names
    assert not any("text_projection" in n for n in names)

    tk = clip_tokenizer_init(f)
    assert f.get_int("sam3.tokenizer.max_length") == 8
    toks = tk.tokenize("abc", 8)
    assert list(toks.token_ids[:3]) == [12, 9, 13]


def test_convert_esrgan_new_arch_names(tmp_path):
    """BasicSR new-arch checkpoint -> normalized old-arch GGUF -> load ->
    forward matches the equivalent old-arch model (the reference routes
    this through spandrel, convert.py:504-527)."""
    from test_esrgan import RRDBNet
    from vision_tpu.models.esrgan import esrgan_load_model, esrgan_compute
    from vision_tpu.core.device import BackendType, backend_init

    t = randomize(RRDBNet(nf=8, nb=2, gc=4, scale=4))
    old_sd = t.state_dict()
    new_sd = {}
    for k, v in old_sd.items():
        parts = k.split(".")
        if k.startswith("model.0."):
            new_sd["conv_first." + parts[-1]] = v
        elif k.startswith("model.1.sub.2."):  # trunk conv (nb=2)
            new_sd["conv_body." + parts[-1]] = v
        elif k.startswith("model.1.sub."):
            i, rdb, conv = parts[3], parts[4], parts[5]
            new_sd[f"body.{i}.rdb{rdb[-1]}.{conv}.{parts[-1]}"] = v
        elif k.startswith("model.3."):
            new_sd["conv_up1." + parts[-1]] = v
        elif k.startswith("model.6."):
            new_sd["conv_up2." + parts[-1]] = v
        elif k.startswith("model.8."):
            new_sd["conv_hr." + parts[-1]] = v
        elif k.startswith("model.10."):
            new_sd["conv_last." + parts[-1]] = v
        else:
            raise AssertionError(k)
    ckpt = tmp_path / "esrgan_new.pth"
    torch.save(new_sd, ckpt)
    out = convert_model("esrgan", ckpt, tmp_path / "esrgan_new.gguf")
    f = GGUFFile(out)
    assert f.get_int("esrgan.scale") == 4
    assert f.get_int("esrgan.block_count") == 2
    model = esrgan_load_model(str(out), backend_init(BackendType.cpu))
    img = image_load_array(np.random.default_rng(0).integers(0, 256, (16, 20, 3)).astype(np.uint8))
    res = esrgan_compute(model, img)
    with torch.no_grad():
        y = t(torch.from_numpy(img.data[:, :, :3].astype(np.float32) / 255.0).permute(2, 0, 1)[None])
    exp = np.clip(y[0].permute(1, 2, 0).numpy(), 0, 1) * 255
    rms = np.sqrt((((exp - res.data[:, :, :3].astype(np.float32)) / 255) ** 2).mean())
    assert rms < 0.01, rms


def test_convert_yolov9t_ultralytics_naming(tmp_path):
    """Ultralytics checkpoints keep the detect head at model.22.* — the
    converter remaps it to detect.* (reference scripts/yolov9t.py:160-236)."""
    from test_yolov9t import TYolo

    t = randomize(TYolo())
    sd = {
        (k.replace("detect.", "model.22.") if k.startswith("detect.") else k): v
        for k, v in t.state_dict().items()
    }
    ckpt = tmp_path / "yolo_ul.pth"
    torch.save(sd, ckpt)
    out = convert_model("yolov9t", ckpt, tmp_path / "yolo_ul.gguf")
    f = GGUFFile(out)
    names = f.tensor_names()
    assert any(n.startswith("detect.") for n in names)
    assert not any(n.startswith("model.22.") for n in names)


def test_convert_esrgan_params_ema_wrapper(tmp_path):
    """Official Real-ESRGAN releases wrap weights in {'params_ema': ...}."""
    from test_esrgan import RRDBNet

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    new_sd = {}
    for k, v in t.state_dict().items():
        parts = k.split(".")
        if k.startswith("model.0."):
            new_sd["conv_first." + parts[-1]] = v
        elif k.startswith("model.1.sub.1."):
            new_sd["conv_body." + parts[-1]] = v
        elif k.startswith("model.1.sub."):
            new_sd[f"body.{parts[3]}.rdb{parts[4][-1]}.{parts[5]}.{parts[-1]}"] = v
        elif k.startswith("model.3."):
            new_sd["conv_up1." + parts[-1]] = v
        elif k.startswith("model.6."):
            new_sd["conv_up2." + parts[-1]] = v
        elif k.startswith("model.8."):
            new_sd["conv_hr." + parts[-1]] = v
        elif k.startswith("model.10."):
            new_sd["conv_last." + parts[-1]] = v
    ckpt = tmp_path / "wrapped.pth"
    torch.save({"params_ema": new_sd}, ckpt)
    out = convert_model("esrgan", ckpt, tmp_path / "wrapped.gguf")
    f = GGUFFile(out)
    assert f.get_int("esrgan.scale") == 4 and f.get_int("esrgan.block_count") == 1


def test_convert_esrgan_pixel_unshuffle_rejected(tmp_path):
    """x2 models (conv_first in_ch=12 via pixel_unshuffle) must fail with a
    clear error, not mis-convert as scale 4."""
    from vision_tpu.core.errors import VispError

    sd = {
        "conv_first.weight": torch.zeros(8, 12, 3, 3),
        "conv_first.bias": torch.zeros(8),
        "body.0.rdb1.conv1.weight": torch.zeros(4, 8, 3, 3),
        "body.0.rdb1.conv1.bias": torch.zeros(4),
        "conv_up1.weight": torch.zeros(8, 8, 3, 3),
        "conv_up1.bias": torch.zeros(8),
        "conv_up2.weight": torch.zeros(8, 8, 3, 3),
        "conv_up2.bias": torch.zeros(8),
    }
    ckpt = tmp_path / "x2.pth"
    torch.save(sd, ckpt)
    with pytest.raises(VispError, match="pixel-unshuffled"):
        convert_model("esrgan", ckpt, tmp_path / "x2.gguf")


def test_modular_process_functions_match_reference_surface():
    """The reference's modular pre/post API (vision.h: *_process_input /
    *_process_output) is exposed as standalone functions, even though the
    Model classes fuse these steps into the device program."""
    import numpy as np

    from vision_tpu.image import ImageFormat, image_load_array
    from vision_tpu.models.birefnet import (
        BirefnetParams,
        birefnet_process_input,
        birefnet_process_output,
    )
    from vision_tpu.models.depth_anything import (
        DepthAnythingParams,
        depthany_process_input,
        depthany_process_output,
    )
    from vision_tpu.models.migan import migan_process_output
    from vision_tpu.models.swin import SWIN_T_PARAMS

    rng = np.random.default_rng(0)
    img = image_load_array(rng.integers(0, 256, (200, 300, 3)).astype(np.uint8))

    bp = BirefnetParams(image_size=256, image_extent=(256, 256), encoder=SWIN_T_PARAMS)
    x = birefnet_process_input(img, bp)
    assert x.shape == (256, 256, 3) and x.dtype == np.float32
    # ImageNet normalization applied: mean not ~0.5/255-scaled
    assert -3.0 < x.mean() < 3.0 and x.std() > 0.5
    m = birefnet_process_output(rng.random((256, 256)).astype(np.float32), img.extent)
    assert m.extent == img.extent and m.format == ImageFormat.alpha_u8

    dp = DepthAnythingParams()
    x = depthany_process_input(img, dp)
    assert x.shape[2] == 3 and x.shape[0] % 14 == 0 and x.shape[1] % 14 == 0
    d = depthany_process_output(rng.random((518, 784)).astype(np.float32) * 3.0, img.extent)
    assert d.extent == img.extent and d.format == ImageFormat.alpha_f32
    assert float(d.data.min()) >= 0.0 and float(d.data.max()) <= 1.0

    mask = image_load_array((rng.random((200, 300, 1)) > 0.5).astype(np.uint8) * 255)
    out = migan_process_output(rng.random((256, 256, 3)).astype(np.float32) * 2 - 1, img, mask)
    assert out.extent == img.extent and out.format == ImageFormat.rgba_u8


def test_shape_bucket_clamp_stays_multiple():
    """max_extent clamping must keep the bucket a multiple (a raw min()
    broke the whole contract when max_extent wasn't itself a multiple)."""
    from vision_tpu.core.graph import shape_bucket

    assert shape_bucket((1000, 800), 128, max_extent=1000) == (896, 896)
    assert shape_bucket((100, 100), 128, max_extent=1000) == (128, 128)


def test_backend_init_cpu_after_default_platform():
    """An explicit CPU request succeeds even when another platform is jax's
    default (the default enumeration hides the CPU backend)."""
    from vision_tpu.core.device import BackendType, backend_init, backend_is_available

    backend_init()  # whatever the default platform is
    d = backend_init(BackendType.cpu)
    assert d.type == BackendType.cpu
    assert backend_is_available(BackendType.cpu)


def test_checkpoint_loader_preserves_integer_buffers(tmp_path):
    """_load_checkpoint keeps integer checkpoint buffers (bn
    num_batches_tracked, index tables) at their dtype — the reference
    converter writes them as integer GGUF tensors, not F32 (review r4c)."""
    import torch

    from vision_tpu.convert.convert import _load_checkpoint

    torch.save(
        {
            "w": torch.ones(4, dtype=torch.float16),
            "n": torch.tensor(7, dtype=torch.int64),
            "idx": torch.arange(6, dtype=torch.int32),
        },
        tmp_path / "m.pth",
    )
    out = _load_checkpoint(tmp_path / "m.pth")
    assert out["w"].dtype == np.float32  # halves widen to f32
    assert out["n"].dtype == np.int64 and int(out["n"]) == 7
    assert out["idx"].dtype == np.int32


def test_shape_bucket_rejects_impossible_cap():
    """max_extent below the multiple cannot hold any valid bucket; it must
    raise instead of silently exceeding the HBM-derived cap (review r4c)."""
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.graph import shape_bucket

    with pytest.raises(VispError, match="max_extent"):
        shape_bucket((50, 50), 128, max_extent=100)


def test_graph_cache_rejects_zero_entries():
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.graph import GraphCache

    with pytest.raises(VispError, match="max_entries"):
        GraphCache(lambda: None, max_entries=0)


def test_load_model_accepts_open_gguf(tmp_path):
    """load_model parses the header ONCE: an already-open GGUFFile flows
    through model_load and the family loader untouched (review r4c)."""
    from test_esrgan import RRDBNet

    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.core.gguf import model_load

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    ckpt = tmp_path / "e.pth"
    torch.save(t.state_dict(), ckpt)
    out = convert_model("esrgan", ckpt, tmp_path / "once.gguf")
    f = model_load(str(out))
    assert model_load(f) is f
    model = load_model(f, device=backend_init(BackendType.cpu))
    assert type(model).__name__ == "EsrganModel"
