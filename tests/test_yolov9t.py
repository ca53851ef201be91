"""YOLOv9t parity tests (reference tests/test_yolov9t.py pattern). Torch
replica mirrors the GGUF naming (conv + fused scale/shift bn) at reduced
width for speed; full-model forward, DFL, anchors, letterbox, and NMS."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.image import image_load_array
from vision_tpu.models.yolov9t import (
    Detection,
    Yolov9tParams,
    aconv,
    conv_block,
    dfl_decode,
    dist2bbox,
    detect_forward,
    elan1,
    letterbox,
    make_anchors,
    non_max_suppression,
    rep_conv,
    rep_csp,
    rep_ncspelan4,
    scale_boxes,
    sppelan,
    yolov9t_backbone,
    yolov9t_forward,
)

from workbench import input_tensor, make_params, randomize, tensors_match, to_nhwc


class ScaleShift(nn.Module):
    """BN fused to mul/add at conversion time."""

    def __init__(self, ch):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(ch) * 0.1 + 1.0)
        self.bias = nn.Parameter(torch.randn(ch) * 0.1)

    def forward(self, x):
        return x * self.weight.view(1, -1, 1, 1) + self.bias.view(1, -1, 1, 1)


class TConv(nn.Module):
    def __init__(self, ci, co, k, s=1, p=-1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, s, k // 2 if p == -1 else p, bias=False)
        self.bn = ScaleShift(co)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.silu(x) if self.act else x


class TRepConv(nn.Module):
    def __init__(self, ci, co, act=True):
        super().__init__()
        self.conv1 = TConv(ci, co, 3, 1, 1, act=False)
        self.conv2 = TConv(ci, co, 1, 1, 0, act=False)
        self.act = act

    def forward(self, x):
        y = self.conv1(x) + self.conv2(x)
        return F.silu(y) if self.act else y


class TRepBottleneck(nn.Module):
    def __init__(self, ci, co, shortcut=True):
        super().__init__()
        self.cv1 = TRepConv(ci, co)
        self.cv2 = TConv(co, co, 3)
        self.shortcut = shortcut and ci == co

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.shortcut else y


class TRepCSP(nn.Module):
    def __init__(self, ci, co, n=1, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(co * e)
        self.cv1 = TConv(ci, c_, 1)
        self.cv2 = TConv(ci, c_, 1)
        self.cv3 = TConv(2 * c_, co, 1)
        self.m = nn.ModuleList([TRepBottleneck(c_, c_, shortcut) for _ in range(n)])

    def forward(self, x):
        y1, y2 = self.cv1(x), self.cv2(x)
        for blk in self.m:
            y1 = blk(y1)
        return self.cv3(torch.cat([y1, y2], 1))


class TRepNCSPELAN4(nn.Module):
    def __init__(self, ci, co, c3, c4, n=1):
        super().__init__()
        self.cv1 = TConv(ci, c3, 1)
        self.cv2 = nn.ModuleList([TRepCSP(c3 // 2, c4, n), TConv(c4, c4, 3)])
        self.cv3 = nn.ModuleList([TRepCSP(c4, c4, n), TConv(c4, c4, 3)])
        self.cv4 = TConv(c3 + 2 * c4, co, 1)

    def forward(self, x):
        y = self.cv1(x)
        c = y.shape[1] // 2
        y0, y1 = y[:, :c], y[:, c:]
        cv2 = self.cv2[1](self.cv2[0](y1))
        cv3 = self.cv3[1](self.cv3[0](cv2))
        return self.cv4(torch.cat([y0, y1, cv2, cv3], 1))


class TELAN1(nn.Module):
    def __init__(self, ci, co, c3, c4):
        super().__init__()
        self.cv1 = TConv(ci, c3, 1)
        self.cv2 = TConv(c3 // 2, c4, 3)
        self.cv3 = TConv(c4, c4, 3)
        self.cv4 = TConv(c3 + 2 * c4, co, 1)

    def forward(self, x):
        y = self.cv1(x)
        c = y.shape[1] // 2
        y0, y1 = y[:, :c], y[:, c:]
        cv2 = self.cv2(y1)
        cv3 = self.cv3(cv2)
        return self.cv4(torch.cat([y0, y1, cv2, cv3], 1))


class TAConv(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.cv1 = TConv(ci, co, 3, 2, 1)

    def forward(self, x):
        return self.cv1(F.avg_pool2d(x, 2, 1, 0))


class TSPPELAN(nn.Module):
    def __init__(self, ci, co, c3, k=5):
        super().__init__()
        self.cv1 = TConv(ci, c3, 1)
        self.cv5 = TConv(4 * c3, co, 1)
        self.k = k

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(F.max_pool2d(y[-1], self.k, 1, self.k // 2))
        return self.cv5(torch.cat(y, 1))


def test_conv_block():
    t = randomize(TConv(4, 8, 3, 2))
    x = input_tensor(1, 4, 16, 16)
    expected = to_nhwc(t(x))
    actual = conv_block(make_params(t), to_nhwc(x), 3, 2)
    tensors_match(torch.from_numpy(expected), actual, label="yconv", atol=1e-4)


def test_rep_conv():
    t = randomize(TRepConv(4, 8))
    x = input_tensor(1, 4, 8, 8)
    expected = to_nhwc(t(x))
    actual = rep_conv(make_params(t), to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="repconv", atol=1e-4)


def test_rep_csp():
    t = randomize(TRepCSP(8, 8, n=2))
    x = input_tensor(1, 8, 8, 8)
    expected = to_nhwc(t(x))
    actual = rep_csp(make_params(t), to_nhwc(x), n=2)
    tensors_match(torch.from_numpy(expected), actual, label="repcsp", atol=1e-3)


def test_rep_ncspelan4():
    t = randomize(TRepNCSPELAN4(8, 8, 8, 4, n=1))
    x = input_tensor(1, 8, 8, 8)
    expected = to_nhwc(t(x))
    actual = rep_ncspelan4(make_params(t), to_nhwc(x), n=1)
    tensors_match(torch.from_numpy(expected), actual, label="elan4", atol=1e-3)


def test_elan1_aconv_sppelan():
    t1 = randomize(TELAN1(8, 8, 8, 4))
    t2 = randomize(TAConv(8, 12))
    t3 = randomize(TSPPELAN(8, 8, 4))
    x = input_tensor(1, 8, 8, 8)
    tensors_match(
        torch.from_numpy(to_nhwc(t1(x))), elan1(make_params(t1), to_nhwc(x)), label="elan1", atol=1e-3
    )
    tensors_match(
        torch.from_numpy(to_nhwc(t2(x))), aconv(make_params(t2), to_nhwc(x)), label="aconv", atol=1e-4
    )
    tensors_match(
        torch.from_numpy(to_nhwc(t3(x))), sppelan(make_params(t3), to_nhwc(x)), label="sppelan", atol=1e-4
    )


def test_dfl_decode():
    g = torch.Generator().manual_seed(3)
    logits = torch.randn(1, 10, 64, generator=g)
    x = logits.view(1, 10, 4, 16)
    expected = (x.softmax(-1) * torch.arange(16.0)).sum(-1)
    actual = dfl_decode(logits.numpy(), 16)
    tensors_match(expected, actual, label="dfl", atol=1e-5)


def test_make_anchors():
    anchors, strides = make_anchors([(2, 3), (1, 2)], strides=(8.0, 16.0))
    assert anchors.shape == (8, 2) and strides.shape == (8, 1)
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[1], [1.5, 0.5])
    np.testing.assert_allclose(anchors[3], [0.5, 1.5])
    assert strides[5, 0] == 8.0 and strides[6, 0] == 16.0


def test_dist2bbox():
    anchors = np.array([[2.0, 3.0]], np.float32)
    dist = np.array([[[1.0, 1.0, 2.0, 2.0]]], np.float32)
    out = np.asarray(dist2bbox(dist, anchors))
    np.testing.assert_allclose(out[0, 0], [1.0, 2.0, 4.0, 5.0])


# -- scaled-down full model --


class TYolo(nn.Module):
    """Width-reduced YOLOv9t with exact module naming (model.0..21 + detect)."""

    CH = dict(c0=4, c1=8, c2=8, c3=16, c4=16, c5=24, c6=24, c7=32, c8=32, c9=32)

    def __init__(self, nc=4):
        super().__init__()
        C = self.CH
        m = {}
        m["0"] = TConv(3, C["c0"], 3, 2)
        m["1"] = TConv(C["c0"], C["c1"], 3, 2)
        m["2"] = TELAN1(C["c1"], C["c2"], 8, 4)
        m["3"] = TAConv(C["c2"], C["c3"])
        m["4"] = TRepNCSPELAN4(C["c3"], C["c3"], 16, 8, 1)
        m["5"] = TAConv(C["c3"], C["c5"])
        m["6"] = TRepNCSPELAN4(C["c5"], C["c5"], 24, 12, 1)
        m["7"] = TAConv(C["c5"], C["c7"])
        m["8"] = TRepNCSPELAN4(C["c7"], C["c7"], 32, 16, 1)
        m["9"] = TSPPELAN(C["c7"], C["c7"], 16)
        m["12"] = TRepNCSPELAN4(C["c7"] + C["c5"], C["c5"], 24, 12, 1)
        m["15"] = TRepNCSPELAN4(C["c5"] + C["c3"], C["c3"], 16, 8, 1)
        m["16"] = TAConv(C["c3"], 12)
        m["18"] = TRepNCSPELAN4(12 + C["c5"], C["c5"], 24, 12, 1)
        m["19"] = TAConv(C["c5"], 16)
        m["21"] = TRepNCSPELAN4(16 + C["c7"], C["c7"], 32, 16, 1)
        self.model = nn.ModuleDict(m)
        det = nn.Module()
        ch = [C["c3"], C["c5"], C["c7"]]
        reg_max = 16
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3h = max(ch[0], min(nc, 100))
        det.cv2 = nn.ModuleList([
            nn.ModuleList([TConv(c, c2, 3), TConv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1)])
            for c in ch
        ])
        det.cv3 = nn.ModuleList([
            nn.ModuleList([TConv(c, c3h, 3), TConv(c3h, c3h, 3), nn.Conv2d(c3h, nc, 1)])
            for c in ch
        ])
        self.detect = det
        self.nc = nc

    def forward(self, x):
        m = self.model
        f = {}
        f[0] = m["0"](x)
        f[1] = m["1"](f[0])
        f[2] = m["2"](f[1])
        f[3] = m["3"](f[2])
        f[4] = m["4"](f[3])
        f[5] = m["5"](f[4])
        f[6] = m["6"](f[5])
        f[7] = m["7"](f[6])
        f[8] = m["8"](f[7])
        f[9] = m["9"](f[8])
        f[10] = F.interpolate(f[9], scale_factor=2, mode="nearest")
        f[11] = torch.cat([f[10], f[6]], 1)
        f[12] = m["12"](f[11])
        f[13] = F.interpolate(f[12], scale_factor=2, mode="nearest")
        f[14] = torch.cat([f[13], f[4]], 1)
        f[15] = m["15"](f[14])
        f[16] = m["16"](f[15])
        f[17] = torch.cat([f[16], f[12]], 1)
        f[18] = m["18"](f[17])
        f[19] = m["19"](f[18])
        f[20] = torch.cat([f[19], f[9]], 1)
        f[21] = m["21"](f[20])
        outs, shapes = [], []
        for i, feat in enumerate([f[15], f[18], f[21]]):
            d = self.detect
            r = d.cv2[i][2](d.cv2[i][1](d.cv2[i][0](feat)))
            c = d.cv3[i][2](d.cv3[i][1](d.cv3[i][0](feat)))
            comb = torch.cat([r, c], 1)
            b, ch_, h, w = comb.shape
            outs.append(comb.permute(0, 2, 3, 1).reshape(b, h * w, ch_))
            shapes.append((h, w))
        x_cat = torch.cat(outs, 1)
        box_l, cls_l = x_cat[..., :64], x_cat[..., 64:]
        # DFL + dist2bbox
        bsz, a, _ = box_l.shape
        soft = box_l.view(bsz, a, 4, 16).softmax(-1)
        dist = (soft * torch.arange(16.0)).sum(-1)
        anchors, strides = make_anchors(shapes)
        at = torch.from_numpy(anchors)
        lt, rb = dist[..., :2], dist[..., 2:]
        boxes = torch.cat([at - lt, at + rb], -1) * torch.from_numpy(strides)
        return boxes, torch.sigmoid(cls_l)


def test_yolov9t_forward_full():
    t = randomize(TYolo())
    x = input_tensor(1, 3, 64, 64)
    with torch.no_grad():
        eboxes, escores = t(x)
    out = yolov9t_forward(make_params(t), to_nhwc(x), Yolov9tParams(num_classes=4), n_csp=1)
    tensors_match(eboxes, out.boxes, label="yolo_boxes", atol=5e-3, rtol=1e-2)
    tensors_match(escores, out.scores, label="yolo_scores", atol=1e-3)


def test_letterbox():
    img = image_load_array(np.zeros((100, 200, 3), np.uint8))
    arr, gain, dw, dh = letterbox(img, 64)
    assert arr.shape == (64, 64, 3)
    assert gain == pytest.approx(64 / 200)
    assert dh == pytest.approx((64 - 32) / 2)
    # border color 114 at top
    assert (arr[0] == 114).all()


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]], np.float32
    )
    scores = np.zeros((4, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8  # overlaps box 0, same class -> suppressed
    scores[2, 0] = 0.7
    scores[3, 1] = 0.85  # same box, DIFFERENT class -> kept
    dets = non_max_suppression(boxes, scores, conf_thres=0.25, iou_thres=0.45)
    assert len(dets) == 3
    ids = sorted((d.class_id, round(d.x1)) for d in dets)
    assert (0, 0) in ids and (0, 50) in ids and (1, 0) in ids


def test_scale_boxes():
    dets = [Detection(10, 20, 30, 40, 0.9, 0)]
    scale_boxes(dets, (100, 50), gain=2.0, pad_w=5.0, pad_h=10.0)
    d = dets[0]
    assert (d.x1, d.y1, d.x2, d.y2) == (2.5, 5.0, 12.5, 15.0)
