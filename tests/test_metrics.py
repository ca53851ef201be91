"""Evaluation metrics (vision_tpu/utils/metrics.py) — hand-worked oracles.

The reference ships only an RMS compare; every metric here is pinned to
either a hand-computed value or an independent naive implementation.
"""

import jax
import numpy as np
import pytest

from vision_tpu.utils.metrics import (
    average_precision,
    box_iou_matrix,
    depth_metrics,
    detection_map,
    mask_iou,
    mean_iou,
    psnr,
    ssim,
)


def test_psnr_known_values():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> 10*log10(1/0.01) = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-5)
    assert float(psnr(a, a)) == np.inf
    # max_val matters: u8 images at max 255
    np.testing.assert_allclose(
        float(psnr(a * 255, b * 255, max_val=255.0)), 10 * np.log10(255**2 / 25.5**2), atol=1e-4
    )


def _naive_ssim(a, b, max_val=1.0, window=11, sigma=1.5):
    """Direct per-window SSIM (Wang et al. eq. 13) as an independent oracle."""
    r = np.arange(window) - (window - 1) / 2
    k = np.exp(-(r**2) / (2 * sigma**2))
    k = k / k.sum()
    K = np.outer(k, k)
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    h, w = a.shape
    vals = []
    for i in range(h - window + 1):
        for j in range(w - window + 1):
            pa = a[i : i + window, j : j + window]
            pb = b[i : i + window, j : j + window]
            mua, mub = (K * pa).sum(), (K * pb).sum()
            va = (K * pa * pa).sum() - mua**2
            vb = (K * pb * pb).sum() - mub**2
            cov = (K * pa * pb).sum() - mua * mub
            vals.append(
                ((2 * mua * mub + c1) * (2 * cov + c2))
                / ((mua**2 + mub**2 + c1) * (va + vb + c2))
            )
    return float(np.mean(vals))


def test_ssim_matches_naive_oracle():
    rng = np.random.default_rng(0)
    a = rng.random((16, 16)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(ssim(a[..., None], b[..., None]))
    want = _naive_ssim(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-5)
    np.testing.assert_allclose(float(ssim(a[..., None], a[..., None])), 1.0, atol=1e-6)
    # degradation ordering: more noise -> lower ssim
    worse = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    assert float(ssim(a[..., None], worse[..., None])) < got
    # batched NHWC + multichannel + jit all work
    n = rng.random((2, 16, 16, 3)).astype(np.float32)
    assert float(jax.jit(ssim)(n, n)) == pytest.approx(1.0, abs=1e-6)


def test_mask_iou():
    p = np.zeros((2, 4, 4), bool)
    t = np.zeros((2, 4, 4), bool)
    p[0, :2], t[0, 1:3] = True, True  # inter 4, union 12
    per_item = np.asarray(mask_iou(p, t, axis=(-2, -1)))
    np.testing.assert_allclose(per_item, [4 / 12, 1.0], atol=1e-6)  # both-empty -> 1


def test_mean_iou_excludes_absent_classes():
    pred = np.array([[0, 0], [1, 1]])
    true = np.array([[0, 1], [1, 1]])
    # class 0: inter 1 / union 2; class 1: inter 2 / union 3; class 2 absent
    np.testing.assert_allclose(
        float(mean_iou(pred, true, n_classes=3)), (0.5 + 2 / 3) / 2, atol=1e-6
    )


def test_depth_metrics_hand_values():
    true = np.array([1.0, 2.0, 0.0, 4.0])  # 0 = invalid pixel
    pred = np.array([1.1, 1.0, 9.9, 4.0])
    m = depth_metrics(pred, true)
    np.testing.assert_allclose(m["absrel"], (0.1 / 1 + 1.0 / 2 + 0.0) / 3, atol=1e-6)
    np.testing.assert_allclose(m["rmse"], np.sqrt((0.01 + 1.0 + 0.0) / 3), atol=1e-6)
    np.testing.assert_allclose(m["delta1"], 2 / 3, atol=1e-6)  # ratio 1.1, 2.0, 1.0


def test_box_iou_matrix():
    a = np.array([[0, 0, 2, 2]], np.float32)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [10, 10, 11, 11]], np.float32)
    np.testing.assert_allclose(box_iou_matrix(a, b)[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_average_precision_hand_worked():
    # 2 ground truths; detections in confidence order: TP, FP, TP
    # recall [.5,.5,1], precision [1,.5,2/3] -> envelope [1,2/3,2/3]
    # 101-pt: grid <= 0.5 reads 1.0 (51 pts), grid > 0.5 reads 2/3 (50 pts)
    ap = average_precision(np.array([1.0, 0.0, 1.0]), np.array([0.9, 0.8, 0.7]), n_true=2)
    np.testing.assert_allclose(ap, (51 * 1.0 + 50 * 2 / 3) / 101, atol=1e-9)
    assert average_precision(np.array([]), np.array([]), 0) == 0.0
    assert average_precision(np.array([]), np.array([]), 3) == 0.0


def test_detection_map():
    gts = [
        [(0, 0, 10, 10, 0), (20, 20, 30, 30, 1)],
        [(5, 5, 15, 15, 0)],
    ]
    perfect = [
        [(0, 0, 10, 10, 0.9, 0), (20, 20, 30, 30, 0.8, 1)],
        [(5, 5, 15, 15, 0.95, 0)],
    ]
    out = detection_map(perfect, gts, iou_thresholds=(0.5, 0.75))
    assert out["map"] == pytest.approx(1.0)
    # a trailing duplicate (lower confidence than every TP) does NOT lower
    # interpolated AP — the COCO protocol property
    dup = [perfect[0] + [(0, 0, 10, 10, 0.85, 0)], perfect[1]]
    assert detection_map(dup, gts, iou_thresholds=(0.5,))["map"] == pytest.approx(1.0)
    # but a high-confidence false positive DOES: precision at every recall
    # point drops
    fp = [perfect[0] + [(50, 50, 60, 60, 0.99, 0)], perfect[1]]
    assert detection_map(fp, gts, iou_thresholds=(0.5,))["map"] < 1.0
    with pytest.raises(ValueError, match="images"):
        detection_map(perfect, gts[:1])


def test_detection_map_accepts_yolo_detections():
    from vision_tpu.models.yolov9t import Detection

    det = Detection(0.0, 0.0, 10.0, 10.0, 0.9, 0)
    out = detection_map([[det]], [[(0, 0, 10, 10, 0)]])
    assert out["map"] == pytest.approx(1.0)
