"""Bulk directory inference (vision_tpu/bulk.py): a folder of images
streamed through the batching servers (serve.py), outputs written per
input stem. The servers' grouping/parity semantics are pinned by
tests/test_serve.py; these tests cover the bulk layer on top — input
expansion, mask pairing, the bounded submit-ahead pipeline, per-family
output writing (u8 conversion, YOLO detections.json), and the CLI's
directory-input routing. No reference counterpart: the reference CLI is
one image per invocation (src/cli/cli.cpp)."""

import json
from pathlib import Path

import numpy as np
import pytest

from vision_tpu.bulk import bulk_inputs, bulk_run, pair_masks
from vision_tpu.core.device import backend_init
from vision_tpu.core.errors import VispError
from vision_tpu.image import Image, ImageFormat, image_load, image_save


@pytest.fixture(scope="module")
def dev():
    return backend_init()


@pytest.fixture(scope="module")
def tiny_depthany(dev):
    from vision_tpu.models.depth_anything import DepthAnythingModel, DepthAnythingParams
    from vision_tpu.models.dino import DinoParams
    from vision_tpu.models.random_weights import random_depth_anything_params

    return DepthAnythingModel(
        random_depth_anything_params("test"),
        DepthAnythingParams(
            dino=DinoParams(embed_dim=64, n_heads=2, n_layers=4),
            image_size=126,
            feature_layers=(0, 1, 2, 3),
        ),
        dev,
    )


def _write_images(d, specs, channels=3, seed=0):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    fmt = ImageFormat.rgb_u8 if channels == 3 else ImageFormat.alpha_u8
    paths = []
    for name, (h, w) in specs:
        img = Image(rng.integers(0, 255, (h, w, channels), np.uint8), fmt)
        p = d / f"{name}.png"
        image_save(img, p)
        paths.append(str(p))
    return paths


def test_bulk_depthany_mixed_extents(tmp_path, tiny_depthany):
    """Two shape buckets stream through one run; outputs keep each
    input's extent and match the direct compute path's u8 conversion."""
    _write_images(tmp_path / "in", [
        ("a", (126, 140)), ("b", (126, 140)), ("c", (98, 98)),
        ("d", (126, 140)), ("e", (98, 98)),
    ])
    logs = []
    outs = bulk_run(tiny_depthany, bulk_inputs(tmp_path / "in"),
                    tmp_path / "out", log=logs.append)
    assert sorted(Path(o).name for o in outs) == [f"{n}.png" for n in "abcde"]
    out_a = image_load(tmp_path / "out" / "a.png")
    assert out_a.extent == (140, 126) and out_a.format == ImageFormat.alpha_u8
    # parity: same server program + same float->u8 conversion as the
    # direct path (±1 for rounding at the conversion boundary)
    direct = tiny_depthany.compute(image_load(tmp_path / "in" / "a.png"))
    want = (np.clip(np.asarray(direct.data), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    got = np.asarray(out_a.data)
    assert got.shape == want.shape
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
    assert any("images in" in line for line in logs)  # throughput summary


def test_bulk_migan_mask_pairing(tmp_path, dev):
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params

    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    imgs = _write_images(tmp_path / "img", [("x", (64, 64)), ("y", (64, 64))])
    _write_images(tmp_path / "mask", [("x", (64, 64)), ("y", (64, 64))],
                  channels=1, seed=9)
    pairs = pair_masks(imgs, str(tmp_path / "mask"))
    assert [Path(m).stem for _, m in pairs] == ["x", "y"]
    outs = bulk_run(mg, pairs, tmp_path / "out", log=lambda *_: None)
    assert sorted(Path(o).name for o in outs) == ["x.png", "y.png"]
    assert image_load(tmp_path / "out" / "x.png").format == ImageFormat.rgba_u8
    # a missing same-stem mask is an error, not a silent skip
    with pytest.raises(VispError, match="no mask named 'z"):
        pair_masks([str(tmp_path / "img" / "z.png")], str(tmp_path / "mask"))


def test_bulk_yolo_detections_json(tmp_path, dev):
    from vision_tpu.models.random_weights import random_yolov9t_params
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams

    # 160-px letterbox target: bulk-layer behavior (JSON, annotation,
    # streaming) is size-invariant; 640 stays covered by test_yolov9t
    model = Yolov9tModel(random_yolov9t_params(), Yolov9tParams(input_size=160), dev)
    _write_images(tmp_path / "in", [("u", (100, 120)), ("v", (80, 90))])
    outs = bulk_run(model, bulk_inputs(tmp_path / "in"), tmp_path / "out",
                    conf_thres=0.9, log=lambda *_: None)
    det_file = tmp_path / "out" / "detections.json"
    assert str(det_file) in outs
    dets = json.loads(det_file.read_text())
    assert set(dets) == {"u", "v"}
    for items in dets.values():
        for d in items:
            assert set(d) == {"class", "confidence", "box"} and len(d["box"]) == 4
    assert image_load(tmp_path / "out" / "u.png").extent == (120, 100)


def test_bulk_corrupt_image_skipped(tmp_path, tiny_depthany):
    """A broken file mid-folder is reported and skipped; every other
    image still processes (the documented per-item failure contract)."""
    _write_images(tmp_path / "in", [("a", (98, 98)), ("c", (98, 98))])
    (tmp_path / "in" / "b.png").write_bytes(b"not a png at all")
    logs = []
    outs = bulk_run(tiny_depthany, bulk_inputs(tmp_path / "in"),
                    tmp_path / "out", log=logs.append)
    assert sorted(Path(o).name for o in outs) == ["a.png", "c.png"]
    assert any("FAILED" in line and "b.png" in line for line in logs)
    assert any("1 failed" in line for line in logs)  # summary counts it


def test_bulk_duplicate_stems_refused(tmp_path, tiny_depthany):
    """a.png + a.jpg would clobber one output — the plan is validated
    upfront, before any image is decoded or submitted."""
    _write_images(tmp_path / "in", [("a", (98, 98))])
    (tmp_path / "in" / "a.jpg").write_bytes(b"content never read")
    with pytest.raises(VispError, match="duplicate input stem 'a'"):
        bulk_run(tiny_depthany, bulk_inputs(tmp_path / "in"),
                 tmp_path / "out", log=lambda *_: None)


def test_bulk_input_validation(tmp_path, tiny_depthany):
    with pytest.raises(VispError, match="not a directory"):
        bulk_inputs(tmp_path / "nope")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(VispError, match="no images"):
        bulk_inputs(empty)
    with pytest.raises(VispError, match="unsupported model type"):
        bulk_run(object(), ["x.png"], tmp_path / "o")
    # writing into the input directory must refuse before clobbering
    srcs = _write_images(tmp_path / "same", [("s", (98, 98))])
    with pytest.raises(VispError, match="overwrite"):
        bulk_run(tiny_depthany, srcs, tmp_path / "same", log=lambda *_: None)


def test_bulk_cli_depthany(tmp_path):
    """Directory -i routes the CLI into bulk mode end-to-end."""
    import torch
    from test_depth_anything import TDepthAnything
    from workbench import randomize

    from vision_tpu.cli import main
    from vision_tpu.convert.convert import convert_model

    t = randomize(TDepthAnything())
    torch.save(t.state_dict(), tmp_path / "d.pth")
    model = convert_model("depth-anything", tmp_path / "d.pth", tmp_path / "d.gguf")
    _write_images(tmp_path / "in", [("p", (70, 70)), ("q", (70, 70)), ("r", (70, 70))])
    outdir = tmp_path / "bulk"
    rc = main(["depthany", "-m", str(model), "-i", str(tmp_path / "in"),
               "-o", str(outdir), "-b", "cpu"])
    assert rc == 0
    assert sorted(f.name for f in outdir.iterdir()) == ["p.png", "q.png", "r.png"]
