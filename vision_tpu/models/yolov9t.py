"""YOLOv9t object detection.

TPU-native re-provision of the reference (src/visp/arch/yolov9t.cpp,
src/cli/inference_yolov9t.cpp): 22-layer backbone+neck DAG (Conv/SiLU,
ELAN1, AConv, RepNCSPELAN4 with RepConv duality, SPPELAN, Upsample, Concat),
detect head with 2 branches x 3 scales, DFL decode (softmax over reg_max=16
bins x projection), dist2bbox, sigmoid cls; letterbox preprocessing, host
NMS with the per-class-offset trick, and scale_boxes to undo the letterbox.

TPU-first notes: the reference uploads host-computed anchor grids and the
DFL projection as graph inputs (make_anchors, yolov9t.cpp:875-925); here
they are numpy constants computed at trace time and folded into the jitted
program. NMS stays on host (data-dependent control flow; the candidate set
is tiny after thresholding), mirroring yolov9t.cpp:1117-1253 bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device import BuildFlag, Device, backend_init
from ..core.gguf import GGUFFile, model_load
from ..core.params import Params
from ..core.weights import load_weights
from ..image import Image, ImageFormat, image_load_array, image_scale, preprocess_scale_method
from ..ops import avg_pool_2d, batch_norm_2d, conv_2d, max_pool_2d, resize_nhwc, sigmoid, silu

__all__ = [
    "Yolov9tParams",
    "yolov9t_detect_params",
    "yolov9t_forward",
    "letterbox",
    "non_max_suppression",
    "scale_boxes",
    "Yolov9tModel",
    "yolov9t_load_model",
    "COCO_CLASS_NAMES",
]


@dataclass(frozen=True)
class Yolov9tParams:
    num_classes: int = 80
    input_size: int = 640
    reg_max: int = 16
    n_csp: int = 3  # RepCSP bottleneck depth (3 in YOLOv9t)


def yolov9t_detect_params(file: GGUFFile) -> Yolov9tParams:
    """The reference hardcodes 80 classes / 640px (yolov9t.cpp:43-53); here
    num_classes and the RepCSP depth are additionally detected from the
    tensor shapes so width-reduced checkpoints load through the same path."""
    from dataclasses import replace

    p = Yolov9tParams()
    cls_w = "detect.cv3.0.2.weight"
    if cls_w in file:
        # shape[0] is the out-channel (= class) count in BOTH layouts:
        # torch-canonical (nc,I,kH,kW) and cwhn-permuted (nc,kH,kW,I)
        p = replace(p, num_classes=int(file.tensors[cls_w].shape[0]))
    n = 0
    while f"model.4.cv2.0.m.{n}.cv1.conv1.conv.weight" in file:
        n += 1
    if n:
        p = replace(p, n_csp=n)
    return p


def _autopad(k: int, p: int = -1) -> int:
    return k // 2 if p == -1 else p


def conv_block(p: Params, x, k: int, s: int = 1, pad: int = -1, act: bool = True):
    """Conv + (fused) BN + SiLU (reference yolov9t.cpp Conv, :78-146)."""
    x = conv_2d(p["conv"], x, s, _autopad(k, pad))
    if p.has("bn.weight"):
        x = batch_norm_2d(p["bn"], x)
    if act:
        x = silu(x)
    return x


def rep_conv(p: Params, x, act: bool = True):
    """Two-branch re-parameterizable conv (yolov9t.cpp RepConv, :256-301)."""
    a = conv_block(p["conv1"], x, 3, 1, 1, act=False)
    b = conv_block(p["conv2"], x, 1, 1, 0, act=False)
    out = a + b
    return silu(out) if act else out


def rep_bottleneck(p: Params, x, shortcut: bool = True):
    c1 = x.shape[-1]
    y = rep_conv(p["cv1"], x)
    y = conv_block(p["cv2"], y, 3)
    if shortcut and y.shape[-1] == c1:
        y = x + y
    return y


def rep_csp(p: Params, x, n: int = 1, shortcut: bool = True):
    y1 = conv_block(p["cv1"], x, 1)
    y2 = conv_block(p["cv2"], x, 1)
    m = y1
    for i in range(n):
        m = rep_bottleneck(p["m"][i], m, shortcut)
    return conv_block(p["cv3"], jnp.concatenate([m, y2], -1), 1)


def rep_ncspelan4(p: Params, x, n: int = 1):
    """(reference yolov9t.cpp RepNCSPELAN4, :406-447)."""
    y = conv_block(p["cv1"], x, 1)
    c = y.shape[-1] // 2
    y0, y1 = y[..., :c], y[..., c:]
    cv2 = conv_block(p["cv2"][1], rep_csp(p["cv2"][0], y1, n), 3)
    cv3 = conv_block(p["cv3"][1], rep_csp(p["cv3"][0], cv2, n), 3)
    cat = jnp.concatenate([y0, y1, cv2, cv3], -1)
    return conv_block(p["cv4"], cat, 1)


def elan1(p: Params, x):
    """(reference yolov9t.cpp ELAN1, :187-235)."""
    y = conv_block(p["cv1"], x, 1)
    c = y.shape[-1] // 2
    y0, y1 = y[..., :c], y[..., c:]
    cv2 = conv_block(p["cv2"], y1, 3)
    cv3 = conv_block(p["cv3"], cv2, 3)
    cat = jnp.concatenate([y0, y1, cv2, cv3], -1)
    return conv_block(p["cv4"], cat, 1)


def aconv(p: Params, x):
    """avg-pool 2x2 s1 + conv s2 (reference yolov9t.cpp AConv, :165-185)."""
    x = avg_pool_2d(x, 2, stride=1)
    return conv_block(p["cv1"], x, 3, 2, 1)


def sppelan(p: Params, x, k: int = 5):
    """(reference yolov9t.cpp SPPELAN, :449-483)."""
    cv1 = conv_block(p["cv1"], x, 1)
    m1 = max_pool_2d(cv1, k, 1, k // 2)
    m2 = max_pool_2d(m1, k, 1, k // 2)
    m3 = max_pool_2d(m2, k, 1, k // 2)
    cat = jnp.concatenate([cv1, m1, m2, m3], -1)
    return conv_block(p["cv5"], cat, 1)


def upsample2(x):
    n, h, w, c = x.shape
    return resize_nhwc(x, (h * 2, w * 2), "nearest")


def yolov9t_backbone(p: Params, x, n_csp: int = 3):
    """22-layer DAG (reference yolov9t_backbone, yolov9t.cpp:507-628).
    Returns the three detect inputs (features 15, 18, 21). Every layer
    output is tagged for capture (the reference's --dump-keys facility,
    yolov9t.cpp:1649-1711)."""
    from ..ops.debug import capture

    m = p["model"]
    f = {}
    f[0] = conv_block(m[0], x, 3, 2)
    f[1] = conv_block(m[1], f[0], 3, 2)
    f[2] = elan1(m[2], f[1])
    f[3] = aconv(m[3], f[2])
    f[4] = rep_ncspelan4(m[4], f[3], n_csp)
    f[5] = aconv(m[5], f[4])
    f[6] = rep_ncspelan4(m[6], f[5], n_csp)
    f[7] = aconv(m[7], f[6])
    f[8] = rep_ncspelan4(m[8], f[7], n_csp)
    f[9] = sppelan(m[9], f[8])
    f[10] = upsample2(f[9])
    f[11] = jnp.concatenate([f[10], f[6]], -1)
    f[12] = rep_ncspelan4(m[12], f[11], n_csp)
    f[13] = upsample2(f[12])
    f[14] = jnp.concatenate([f[13], f[4]], -1)
    f[15] = rep_ncspelan4(m[15], f[14], n_csp)
    f[16] = aconv(m[16], f[15])
    f[17] = jnp.concatenate([f[16], f[12]], -1)
    f[18] = rep_ncspelan4(m[18], f[17], n_csp)
    f[19] = aconv(m[19], f[18])
    f[20] = jnp.concatenate([f[19], f[9]], -1)
    f[21] = rep_ncspelan4(m[21], f[20], n_csp)
    for i, v in f.items():
        capture(f"model.{i}", v)
    return f


def make_anchors(shapes, strides=(8.0, 16.0, 32.0), offset: float = 0.5):
    """Anchor grid as trace-time numpy constants (reference make_anchors,
    yolov9t.cpp:875-925). shapes: [(h, w), ...] per scale."""
    anchors, stride_list = [], []
    for (h, w), s in zip(shapes, strides):
        xs, ys = np.meshgrid(np.arange(w) + offset, np.arange(h) + offset)
        anchors.append(np.stack([xs.reshape(-1), ys.reshape(-1)], -1))
        stride_list.append(np.full(h * w, s, np.float32))
    return (
        np.concatenate(anchors).astype(np.float32),  # (A, 2)
        np.concatenate(stride_list)[:, None],  # (A, 1)
    )


def dfl_decode(box_logits, reg_max: int):
    """softmax over bins x projection (reference dfl_forward,
    yolov9t.cpp:657-691). box_logits: (B, A, 4*reg_max) -> (B, A, 4)."""
    b, a, _ = box_logits.shape
    x = box_logits.reshape(b, a, 4, reg_max).astype(jnp.float32)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("bakr,r->bak", jax.nn.softmax(x, axis=-1), proj)


def dist2bbox(distance, anchor_points):
    """lt/rb distances -> xyxy (reference dist2bbox, yolov9t.cpp:631-655)."""
    lt, rb = distance[..., :2], distance[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    return jnp.concatenate([x1y1, x2y2], -1)


class DetectOutput(NamedTuple):
    boxes: jnp.ndarray  # (B, A, 4) xyxy in input pixels
    scores: jnp.ndarray  # (B, A, nc) sigmoid class probabilities


def detect_forward(p: Params, features, yp: Yolov9tParams) -> DetectOutput:
    """Detect head across 3 scales (reference detect_forward + inference,
    yolov9t.cpp:693-824)."""
    det = p["detect"]
    outs = []
    shapes = []
    for i, feat in enumerate(features):
        r = conv_block(det["cv2"][i][0], feat, 3)
        r = conv_block(det["cv2"][i][1], r, 3)
        r = conv_2d(det["cv2"][i][2], r, 1, 0)
        c = conv_block(det["cv3"][i][0], feat, 3)
        c = conv_block(det["cv3"][i][1], c, 3)
        c = conv_2d(det["cv3"][i][2], c, 1, 0)
        comb = jnp.concatenate([r, c], -1)  # (B, h, w, 4*reg_max + nc)
        b, h, w, ch = comb.shape
        outs.append(comb.reshape(b, h * w, ch))
        shapes.append((h, w))
    x_cat = jnp.concatenate(outs, axis=1)  # (B, A, 144)
    box_logits = x_cat[..., : 4 * yp.reg_max]
    cls_logits = x_cat[..., 4 * yp.reg_max :]
    anchors, strides = make_anchors(shapes)
    dist = dfl_decode(box_logits, yp.reg_max)
    boxes = dist2bbox(dist, jnp.asarray(anchors)) * jnp.asarray(strides)
    return DetectOutput(boxes, sigmoid(cls_logits.astype(jnp.float32)))


def yolov9t_forward(
    params: Params, x, yp: Yolov9tParams = Yolov9tParams(), n_csp: int | None = None
) -> DetectOutput:
    """(reference yolov9t_forward, yolov9t.cpp:827-840). x: (B, H, W, 3)."""
    f = yolov9t_backbone(params, x, yp.n_csp if n_csp is None else n_csp)
    return detect_forward(params, [f[15], f[18], f[21]], yp)


# ---------------------------------------------------------------------------
# pre/post processing (reference yolov9t.cpp:1028-1281)
# ---------------------------------------------------------------------------


def letterbox(image: Image, new_shape: int = 640, color=(114, 114, 114), scaleup: bool = True):
    """Ratio-preserving resize + gray border (reference letterbox,
    yolov9t.cpp:1028-1083, auto=False). Returns (array, gain, pad_w, pad_h)."""
    w, h = image.extent
    r = min(new_shape / h, new_shape / w)
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = round(w * r), round(h * r)
    dw = (new_shape - new_w) / 2.0
    dh = (new_shape - new_h) / 2.0
    resized = image_scale(image, (new_w, new_h), preprocess_scale_method())
    left, right = round(dw - 0.1), round(dw + 0.1)
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    a = resized.to_rgb_u8()
    out = np.full((new_h + top + bottom, new_w + left + right, 3), color, a.dtype)
    out[top : top + new_h, left : left + new_w] = a
    return out, r, dw, dh


@dataclass
class Detection:
    x1: float
    y1: float
    x2: float
    y2: float
    confidence: float
    class_id: int


def _box_iou(b1, b2):
    ix1, iy1 = max(b1[0], b2[0]), max(b1[1], b2[1])
    ix2, iy2 = min(b1[2], b2[2]), min(b1[3], b2[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / (a1 + a2 - inter + 1e-9)


def non_max_suppression(
    boxes: np.ndarray,
    scores: np.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 30000,
    max_wh: int = 7680,
) -> list[Detection]:
    """Host NMS with per-class offsets (reference non_max_suppression + nms,
    yolov9t.cpp:1117-1253). boxes: (A, 4) xyxy; scores: (A, nc)."""
    a_idx, c_idx = np.nonzero(scores >= conf_thres)
    if a_idx.size == 0:
        return []
    cand_boxes = boxes[a_idx]
    cand_scores = scores[a_idx, c_idx]
    cand_cls = c_idx
    if cand_boxes.shape[0] > max_nms:
        order = np.argsort(-cand_scores)[:max_nms]
        cand_boxes, cand_scores, cand_cls = cand_boxes[order], cand_scores[order], cand_cls[order]
    from ..native import nms_native

    kept_native = nms_native(cand_boxes, cand_scores, cand_cls, iou_thres, max_wh, max_det)
    if kept_native is not None:
        return [
            Detection(*cand_boxes[i].tolist(), confidence=float(cand_scores[i]), class_id=int(cand_cls[i]))
            for i in kept_native
        ]
    order = np.argsort(-cand_scores, kind="stable")
    keep_flag = np.ones(len(order), bool)
    kept = []
    blist = cand_boxes.tolist()
    for ii, i in enumerate(order):
        if not keep_flag[i]:
            continue
        kept.append(int(i))
        ci = cand_cls[i] * max_wh
        b1 = [blist[i][0] + ci, blist[i][1], blist[i][2] + ci, blist[i][3]]
        for j in order[ii + 1 :]:
            if not keep_flag[j]:
                continue
            cj = cand_cls[j] * max_wh
            b2 = [blist[j][0] + cj, blist[j][1], blist[j][2] + cj, blist[j][3]]
            if _box_iou(b1, b2) > iou_thres:
                keep_flag[j] = False
    kept = kept[:max_det]
    return [
        Detection(*blist[i], confidence=float(cand_scores[i]), class_id=int(cand_cls[i]))
        for i in kept
    ]


def scale_boxes(detections: list[Detection], img_extent, gain: float, pad_w: float, pad_h: float):
    """Undo letterbox (reference scale_boxes, yolov9t.cpp:1255-1281)."""
    w, h = img_extent
    for d in detections:
        d.x1 = float(np.clip((d.x1 - pad_w) / gain, 0, w))
        d.x2 = float(np.clip((d.x2 - pad_w) / gain, 0, w))
        d.y1 = float(np.clip((d.y1 - pad_h) / gain, 0, h))
        d.y2 = float(np.clip((d.y2 - pad_h) / gain, 0, h))
    return detections


@lru_cache(maxsize=8)
def _yolo_program(pp: Yolov9tParams, dtype):
    """Jitted forward shared across model instances."""

    @jax.jit
    def run(weights, x_u8):
        from ..ops.preprocess import normalize_u8

        x = normalize_u8(x_u8, dtype=dtype)
        return yolov9t_forward(Params(weights), x, pp)

    return run


class Yolov9tModel:
    """``mesh``: optional jax.sharding.Mesh — weights replicate over the
    mesh and a mesh-aware YoloServer dp-shards the grouped request batch
    (the reference's single-request detection, vision.cpp single-image
    semantics, scaled by the chip count); single-image ``compute`` stays
    unsharded."""

    def __init__(self, params: dict, p: Yolov9tParams, device: Device, mesh=None):
        from ..core.weights import cast_float_params

        self.p = p
        self.device = device
        self.mesh = mesh
        params = cast_float_params(params, device.preferred_float_type)
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self._run = _yolo_program(p, device.preferred_float_type)

    def compute(self, image: Image, conf_thres=0.25, iou_thres=0.45) -> list[Detection]:
        arr, gain, dw, dh = letterbox(image, self.p.input_size)
        out = self._run(self.params, jnp.asarray(arr[None]))
        boxes = np.asarray(out.boxes.astype(jnp.float32))[0]
        scores = np.asarray(out.scores.astype(jnp.float32))[0]
        dets = non_max_suppression(boxes, scores, conf_thres, iou_thres)
        return scale_boxes(dets, image.extent, gain, dw, dh)


def yolov9t_load_model(filepath: str, device: Device | None = None, mesh=None) -> Yolov9tModel:
    """``mesh``: place weights on a device mesh for multi-chip serving
    (quantized residency is single-chip only; a mesh forces dequant)."""
    device = device or backend_init()
    file = model_load(filepath)
    p = yolov9t_detect_params(file)
    if mesh is not None:
        params = load_weights(file, device=None, as_numpy=True, keep_quantized=False)
        dtype = device.preferred_float_type
        params = {
            k: np.asarray(v, dtype) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in params.items()
        }
        return Yolov9tModel(params, p, device, mesh=mesh)
    params = load_weights(
        file, device, keep_quantized=bool(device.flags & BuildFlag.keep_quantized)
    )
    return Yolov9tModel(params, p, device)


def get_class_color(class_id: int) -> tuple[int, int, int]:
    """HSV-derived per-class color (reference get_class_color,
    yolov9t.cpp:1420-1442)."""
    h = (class_id * 137) % 360
    s, v = 0.8, 0.95
    c = v * s
    x = c * (1 - abs((h / 60.0) % 2 - 1))
    m = v - c
    r1, g1, b1 = [
        (c, x, 0), (x, c, 0), (0, c, x), (0, x, c), (x, 0, c), (c, 0, x),
    ][int(h // 60) % 6]
    return (int((r1 + m) * 255), int((g1 + m) * 255), int((b1 + m) * 255))


def draw_detections(image: Image, detections: list[Detection], thickness: int = 2) -> Image:
    """Draw boxes + labels (reference draw_detections, yolov9t.cpp:1444-1546;
    PIL replaces the hand-rolled 5x7 font rasterizer)."""
    from PIL import Image as PILImage, ImageDraw

    a = image.data
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    pil = PILImage.fromarray(a[:, :, :3])
    draw = ImageDraw.Draw(pil)
    for d in detections:
        color = get_class_color(d.class_id)
        name = COCO_CLASS_NAMES[d.class_id] if d.class_id < len(COCO_CLASS_NAMES) else str(d.class_id)
        draw.rectangle([d.x1, d.y1, d.x2, d.y2], outline=color, width=thickness)
        label = f"{name} {d.confidence:.2f}"
        tw = draw.textlength(label)
        draw.rectangle([d.x1, max(0, d.y1 - 12), d.x1 + tw + 4, d.y1], fill=color)
        draw.text((d.x1 + 2, max(0, d.y1 - 12)), label, fill=(0, 0, 0))
    return image_load_array(np.asarray(pil), ImageFormat.rgb_u8)


COCO_CLASS_NAMES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck", "boat",
    "traffic light", "fire hydrant", "stop sign", "parking meter", "bench", "bird", "cat",
    "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball",
    "kite", "baseball bat", "baseball glove", "skateboard", "surfboard", "tennis racket",
    "bottle", "wine glass", "cup", "fork", "knife", "spoon", "bowl", "banana", "apple",
    "sandwich", "orange", "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear", "hair drier",
    "toothbrush",
]
