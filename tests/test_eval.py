"""Dataset evaluation (vision_tpu/evaluate.py + the CLI `eval` verb).

Each task's scorer is pinned against hand-computed expectations on tiny
synthetic fixtures (known-overlap masks, affine-warped depth, constant
images, a worked mAP case), then the CLI surface is driven end to end —
scoring-only and with a model (bulk inference feeding the scorer). The
reference has no dataset evaluation (its compare surface is the
single-pair image_difference_rms, tests/test-image.cpp); these metrics
are the production-framework extension documented in utils/metrics.py.
"""

import json

import numpy as np
import pytest

from vision_tpu.core.errors import VispError
from vision_tpu.evaluate import (
    evaluate,
    evaluate_depth,
    evaluate_detections,
    pair_files,
    task_for_family,
)
from vision_tpu.image import image_load_array, image_save


def _save_gray(path, a_u8):
    path.parent.mkdir(parents=True, exist_ok=True)
    image_save(image_load_array(np.asarray(a_u8, np.uint8)[:, :, None]), path)


def _save_rgb(path, a_u8):
    path.parent.mkdir(parents=True, exist_ok=True)
    image_save(image_load_array(np.asarray(a_u8, np.uint8)), path)


# ---------------------------------------------------------------------------
# mask


def test_mask_known_overlap(tmp_path):
    """Two 8x8 squares offset by 2: IoU = 36/92, F1 = 2*36/128, and the
    soft-MAE counts exactly the 56 disagreeing pixels."""
    gt = np.zeros((16, 16), np.uint8)
    gt[2:10, 2:10] = 255
    pred = np.zeros((16, 16), np.uint8)
    pred[4:12, 4:12] = 255
    _save_gray(tmp_path / "gt" / "a.png", gt)
    _save_gray(tmp_path / "pred" / "a.png", pred)
    # second pair: both empty = perfect by convention
    _save_gray(tmp_path / "gt" / "b.png", np.zeros((8, 8), np.uint8))
    _save_gray(tmp_path / "pred" / "b.png", np.zeros((8, 8), np.uint8))

    r = evaluate("mask", tmp_path / "pred", tmp_path / "gt")
    assert r["task"] == "mask" and r["n_images"] == 2
    a = r["per_image"]["a"]
    assert a["iou"] == pytest.approx(36 / 92)
    assert a["f1"] == pytest.approx(2 * 36 / 128)
    assert a["mae"] == pytest.approx(56 / 256)
    b = r["per_image"]["b"]
    assert b["iou"] == 1.0 and b["f1"] == 1.0 and b["mae"] == 0.0
    assert r["mean"]["iou"] == pytest.approx((36 / 92 + 1.0) / 2)


def test_mask_prediction_resized_to_gt(tmp_path):
    """A half-resolution prediction is scored at GT geometry (standard
    protocol): an all-foreground 8x8 pred vs all-foreground 16x16 GT."""
    _save_gray(tmp_path / "gt" / "a.png", np.full((16, 16), 255, np.uint8))
    _save_gray(tmp_path / "pred" / "a.png", np.full((8, 8), 255, np.uint8))
    r = evaluate("mask", tmp_path / "pred", tmp_path / "gt")
    assert r["per_image"]["a"]["iou"] == 1.0


# ---------------------------------------------------------------------------
# depth


def test_depth_scale_shift_alignment(tmp_path):
    """The scorer aligns a relative prediction to GT by least squares:
    pred = 0.25*gt - 0.05 scores ~perfect aligned, badly unaligned."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 2.0, (20, 20)).astype(np.float32)
    (tmp_path / "gt").mkdir()
    (tmp_path / "pred").mkdir()
    np.save(tmp_path / "gt" / "a.npy", gt)
    np.save(tmp_path / "pred" / "a.npy", 0.25 * gt - 0.05)

    r = evaluate("depth", tmp_path / "pred", tmp_path / "gt")
    assert r["aligned"] is True
    m = r["per_image"]["a"]
    assert m["absrel"] == pytest.approx(0.0, abs=1e-5)
    assert m["rmse"] == pytest.approx(0.0, abs=1e-5)
    assert m["delta1"] == 1.0

    pairs = pair_files(tmp_path / "pred", tmp_path / "gt")
    raw = evaluate_depth(pairs, align=False)
    assert raw["aligned"] is False
    assert raw["per_image"]["a"]["absrel"] > 0.5  # 4x scale off


def test_depth_constant_pred_any_resolution(tmp_path):
    """Zero-variance prediction at half resolution: alignment reduces to
    a shift, and the resize path runs (10x10 pred vs 20x20 GT)."""
    (tmp_path / "gt").mkdir()
    (tmp_path / "pred").mkdir()
    np.save(tmp_path / "gt" / "a.npy", np.full((20, 20), 1.0, np.float32))
    np.save(tmp_path / "pred" / "a.npy", np.full((10, 10), 5.0, np.float32))
    r = evaluate("depth", tmp_path / "pred", tmp_path / "gt")
    assert r["per_image"]["a"]["absrel"] == pytest.approx(0.0, abs=1e-6)


def test_depth_16bit_png_gt(tmp_path):
    """16-bit PNG ground truth keeps full depth resolution (u8 would
    crush 65535 levels to 256)."""
    from PIL import Image as PILImage

    from vision_tpu.evaluate import _load_map

    gt16 = (np.arange(256, dtype=np.uint32).reshape(16, 16) * 257).astype(np.uint16)
    p = tmp_path / "gt16.png"
    PILImage.fromarray(gt16, mode="I;16").save(p)
    a = _load_map(p)
    assert a.shape == (16, 16, 1)
    assert a.max() == pytest.approx(65535 / 65535.0)
    assert a[0, 1, 0] == pytest.approx(257 / 65535.0)


# ---------------------------------------------------------------------------
# image (restoration)


def test_image_identical_and_constant_diff(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 24, 3), np.uint8)
    _save_rgb(tmp_path / "gt" / "same.png", img)
    _save_rgb(tmp_path / "pred" / "same.png", img)
    # black pred vs white GT: every lane differs by 1.0 -> 4-lane RMS = 2
    _save_gray(tmp_path / "gt" / "diff.png", np.full((24, 24), 255, np.uint8))
    _save_gray(tmp_path / "pred" / "diff.png", np.zeros((24, 24), np.uint8))

    r = evaluate("image", tmp_path / "pred", tmp_path / "gt")
    same = r["per_image"]["same"]
    assert same["rms"] == 0.0
    assert same["psnr"] == float("inf")
    assert same["ssim"] == pytest.approx(1.0, abs=1e-5)
    diff = r["per_image"]["diff"]
    assert diff["rms"] == pytest.approx(2.0)  # alpha-splat 4-lane semantics
    assert diff["psnr"] == pytest.approx(0.0, abs=1e-4)
    assert diff["ssim"] < 0.01
    # inf psnr excluded from the mean, counted instead
    assert r["mean"]["psnr"] == pytest.approx(0.0, abs=1e-4)
    assert r["mean"]["psnr_n_inf"] == 1


def test_image_extent_mismatch_is_an_error(tmp_path):
    _save_rgb(tmp_path / "gt" / "a.png", np.zeros((16, 16, 3), np.uint8))
    _save_rgb(tmp_path / "pred" / "a.png", np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(VispError, match="match exactly"):
        evaluate("image", tmp_path / "pred", tmp_path / "gt")


# ---------------------------------------------------------------------------
# detection


def _write_detections(path, doc):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(doc))


def test_detection_worked_map(tmp_path):
    """One TP at IoU 2/3 (counts below thr 0.70) + one lower-confidence
    FP: AP@0.5 = 1.0, and over the COCO ladder 4 of 10 thresholds score
    1.0 -> mAP@[.5:.95] = 0.4. Class names map through COCO ids."""
    _write_detections(tmp_path / "pred" / "detections.json", {
        "a": [
            {"class": "person", "confidence": 0.9, "box": [0, 2, 10, 12]},
            {"class": "person", "confidence": 0.8, "box": [50, 50, 60, 60]},
        ],
        "b": [],
    })
    gt = tmp_path / "gt"
    gt.mkdir()
    (gt / "a.txt").write_text("person 0 0 10 10\n")
    (gt / "b.txt").write_text("")  # image with no objects

    r = evaluate("detection", tmp_path / "pred", gt)
    assert r["n_images"] == 2
    assert r["n_predictions"] == 2 and r["n_ground_truths"] == 1
    assert r["mean"]["map50"] == pytest.approx(1.0)
    assert r["mean"]["map50_95"] == pytest.approx(0.4)
    assert r["ap_per_iou"]["0.65"] == pytest.approx(1.0)
    assert r["ap_per_iou"]["0.70"] == pytest.approx(0.0)


def test_detection_confident_fp_halves_ap(tmp_path):
    """The same TP behind a HIGHER-confidence FP: the precision envelope
    at full recall is 1/2 -> AP@0.5 = 0.5."""
    _write_detections(tmp_path / "pred" / "detections.json", {
        "a": [
            {"class": "0", "confidence": 0.95, "box": [50, 50, 60, 60]},
            {"class": "0", "confidence": 0.6, "box": [0, 0, 10, 10]},
        ],
    })
    gt = tmp_path / "gt"
    gt.mkdir()
    (gt / "a.txt").write_text("0 0 0 10 10\n")
    r = evaluate_detections(tmp_path / "pred", gt)
    assert r["mean"]["map50"] == pytest.approx(0.5)


def test_detection_gt_json_and_missing_gt(tmp_path):
    _write_detections(tmp_path / "pred" / "detections.json", {
        "a": [{"class": 0, "confidence": 1.0, "box": [0, 0, 4, 4]}],
    })
    _write_detections(tmp_path / "gt.json", {
        "a": [{"class": 0, "box": [0, 0, 4, 4]}],
    })
    r = evaluate_detections(tmp_path / "pred", tmp_path / "gt.json")
    assert r["mean"]["map50"] == 1.0
    _write_detections(tmp_path / "gt2.json", {"zzz": []})
    with pytest.raises(VispError, match="no ground truth for image"):
        evaluate_detections(tmp_path / "pred", tmp_path / "gt2.json")


# ---------------------------------------------------------------------------
# plumbing


def test_pair_files_and_task_map(tmp_path):
    _save_gray(tmp_path / "pred" / "a.png", np.zeros((4, 4), np.uint8))
    (tmp_path / "gt").mkdir()
    with pytest.raises(VispError, match="no ground truth named 'a"):
        pair_files(tmp_path / "pred", tmp_path / "gt")
    assert task_for_family("birefnet") == "mask"
    assert task_for_family("depth_anything") == "depth"
    assert task_for_family("yolov9t") == "detection"
    with pytest.raises(VispError, match="no evaluation task"):
        task_for_family("sam3")
    with pytest.raises(VispError, match="unknown task"):
        evaluate("nope", tmp_path / "pred", tmp_path / "gt")


# ---------------------------------------------------------------------------
# CLI surface


def test_cli_eval_scoring_only(tmp_path, capsys):
    from vision_tpu.cli import main

    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = 255
    _save_gray(tmp_path / "pred" / "a.png", m)
    _save_gray(tmp_path / "gt" / "a.png", m)
    out = tmp_path / "result.json"
    rc = main(["eval", "--task", "mask", "-i", str(tmp_path / "pred"),
               "--gt", str(tmp_path / "gt"), "-o", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "task mask" in text and "iou" in text
    doc = json.loads(out.read_text())
    assert doc["mean"]["iou"] == 1.0


def test_cli_eval_requires_gt_and_task(tmp_path):
    from vision_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["eval", "--task", "mask", "-i", str(tmp_path)])
    with pytest.raises(SystemExit):
        main(["eval", "-i", str(tmp_path), "--gt", str(tmp_path)])


def test_cli_eval_with_model_end_to_end(tmp_path, capsys):
    """eval -m: bulk inference (tiny random-weight ESRGAN) feeds the
    image scorer; task inferred from the model family."""
    from test_esrgan import RRDBNet, _write_gguf

    from vision_tpu.cli import main
    from workbench import randomize

    esr = _write_gguf(
        tmp_path / "esr.gguf", randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4)), 4, 1
    )
    rng = np.random.default_rng(2)
    for name in ("a", "b"):
        _save_rgb(tmp_path / "in" / f"{name}.png",
                  rng.integers(0, 256, (16, 20, 3), np.uint8))
        _save_rgb(tmp_path / "gt" / f"{name}.png",
                  rng.integers(0, 256, (64, 80, 3), np.uint8))
    out = tmp_path / "r.json"
    rc = main(["eval", "-m", str(esr), "-i", str(tmp_path / "in"),
               "--gt", str(tmp_path / "gt"), "-b", "cpu", "-o", str(out),
               "--pred-out", str(tmp_path / "pred")])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert doc["task"] == "image" and doc["n_images"] == 2
    assert np.isfinite(doc["mean"]["psnr"])
    # predictions kept at --pred-out, at the model's 4x scale
    from vision_tpu.image import image_load

    assert image_load(tmp_path / "pred" / "a.png").extent == (80, 64)
