"""Depth-Anything V2 (DINOv2 backbone + DPT fusion neck + depth head).

TPU-native re-provision of the reference (src/visp/arch/depth-anything.{cpp,h},
high-level path in src/visp/vision.cpp:137-168): per-layer reassemble
(1x1 projection + resize convs x4/x2/1/÷2), fusion stages with residual
convs and align-corners bilinear upsampling, conv head; dynamic input
sizing snaps the short side to >= 518 and multiples of 14
(depthany_image_extent, depth-anything.cpp:112-117); output is min-max
normalized and resized back.
"""

from __future__ import annotations

from functools import lru_cache
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device import BuildFlag, Device, backend_init
from ..core.gguf import GGUFFile, model_load
from ..core.params import Params
from ..core.quant import is_quant
from ..core.weights import load_weights, unpermute_cwhn
from ..image import (
    Image,
    ImageFormat,
    image_normalize,
    image_scale,
    image_u8_to_f32,
    preprocess_scale_method,
)
from ..ops import conv_2d, conv_transpose_2d, relu, resize_nhwc
from .dino import DinoParams, dino_detect_params, dino_get_intermediate_layers

__all__ = [
    "DepthAnythingParams",
    "depthany_detect_params",
    "depthany_image_extent",
    "depthany_predict",
    "depthany_process_input",
    "depthany_process_output",
    "DepthAnythingModel",
    "depthany_load_model",
    "depthany_compute",
]

# shared rgb constants; image_u8_to_f32 pads the neutral 4th lane
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


@dataclass(frozen=True)
class DepthAnythingParams:
    dino: DinoParams = DinoParams()
    image_size: int = 518
    image_multiple: int = 14
    max_depth: float = 1.0
    feature_layers: tuple[int, ...] = (2, 5, 8, 11)


def depthany_detect_params(file: GGUFFile) -> DepthAnythingParams:
    return DepthAnythingParams(
        dino=dino_detect_params(file),
        image_size=file.get_int("depthanything.image_size"),
        max_depth=file.get_float("depthanything.max_depth", 1.0),
        feature_layers=tuple(int(i) for i in file.get_array("depthanything.feature_layers")),
    )


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def depthany_image_extent(extent: tuple[int, int], p: DepthAnythingParams) -> tuple[int, int]:
    """Snap to short side >= image_size and multiples of 14
    (reference depthany_image_extent, depth-anything.cpp:112-117)."""
    min_side = min(extent)
    tgt_side = max(p.image_size, _next_multiple(min_side, p.image_multiple))
    target = (extent[0] * tgt_side // min_side, extent[1] * tgt_side // min_side)
    return (_next_multiple(target[0], p.image_multiple), _next_multiple(target[1], p.image_multiple))


# -- DPT neck (reference depth-anything.cpp:12-103) --


def residual_conv(p: Params, x):
    out = relu(x)
    out = conv_2d(p["convolution1"], out, 1, 1)
    out = relu(out)
    out = conv_2d(p["convolution2"], out, 1, 1)
    return x + out


def feature_fusion(p: Params, x0, x1=None, size=None):
    """(reference dpt::feature_fusion, depth-anything.cpp:24-42)."""
    x = x0
    if x1 is not None:
        x = x + residual_conv(p["residual_layer1"], x1)
    x = residual_conv(p["residual_layer2"], x)
    if size is None:
        size = (x.shape[1] * 2, x.shape[2] * 2)
    x = resize_nhwc(x, size, "bilinear", align_corners=True)
    return conv_2d(p["projection"], x)


def neck(p: Params, features, patch_w: int, patch_h: int):
    """Reassemble + fuse the 4 backbone layers (depth-anything.cpp:44-83).
    features: list of (N, T+1, C) token tensors."""
    layers = []
    reassemble = p["reassemble_stage.layers"]
    for i in range(4):
        x = features[i][:, 1:]  # drop cls token
        b, t, c = x.shape
        x = x.reshape(b, patch_h, patch_w, c)
        x = conv_2d(reassemble[i]["projection"], x)  # 1x1
        if i == 0:
            x = conv_transpose_2d(reassemble[i]["resize"], x, 4)
        elif i == 1:
            x = conv_transpose_2d(reassemble[i]["resize"], x, 2)
        elif i == 3:
            x = conv_2d(reassemble[i]["resize"], x, 2, 1)
        layers.append(x)

    convs = p["convs"]
    layers = [conv_2d(convs[i], layers[i], 1, 1) for i in range(4)]

    fusion = p["fusion_stage.layers"]
    fused = feature_fusion(fusion[0], layers[3], None, layers[2].shape[1:3])
    fused = feature_fusion(fusion[1], fused, layers[2], layers[1].shape[1:3])
    fused = feature_fusion(fusion[2], fused, layers[1], layers[0].shape[1:3])
    fused = feature_fusion(fusion[3], fused, layers[0])
    return fused


def head(p: Params, x, w: int, h: int, max_depth: float):
    """(reference dpt::head, depth-anything.cpp:85-101)."""
    out = conv_2d(p["conv1"], x, 1, 1)
    out = resize_nhwc(out, (h, w), "bilinear", align_corners=True)
    out = conv_2d(p["conv2"], out, 1, 1)
    out = relu(out)
    out = conv_2d(p["conv3"], out)
    out = relu(out)
    if max_depth != 1.0:
        out = out * max_depth
    return out


def depthany_predict(params: Params, image, p: DepthAnythingParams, flash: bool = False):
    """Full depth model (reference depthany_predict, depth-anything.cpp:105-110).
    image: (N, H, W, 3) normalized -> (N, H, W, 1) depth."""
    n, h, w, _ = image.shape
    w_patch, h_patch = w // p.dino.patch_size, h // p.dino.patch_size
    feats = dino_get_intermediate_layers(params["backbone"], image, p.feature_layers, p.dino, flash)
    fused = neck(params["neck"], feats, w_patch, h_patch)
    return head(params["head"], fused, w, h, p.max_depth)


def fixup_weights(file: GGUFFile, params: dict) -> dict:
    """Undo the converter's arch-specific layout choices
    (scripts/convert.py convert_depth_anything): `patch_embeddings` and
    non-fusion `projection` conv weights are stored pre-permuted (cwhn) even
    in whcn files; `resize` transpose convs are always torch layout."""
    if file.tensor_layout in ("cwhn", "torch"):
        # cwhn: generic unpermute already handled everything; torch:
        # every tensor is torch-canonical (train.export_gguf output)
        return params
    out = dict(params)
    for name, a in params.items():
        if a.ndim == 4 and name.endswith("weight") and (
            "patch_embeddings" in name or ("projection" in name and "fusion" not in name)
        ):
            out[name] = a.unpermute_cwhn(name) if is_quant(a) else unpermute_cwhn(name, a)
    return out


@lru_cache(maxsize=8)
def _depthany_program(p: DepthAnythingParams, dtype, flash: bool, mesh=None):
    """Jitted predict shared across model instances. With ``mesh``, the
    image batch is dp-sharded so N chips each predict batch/N depth maps
    (the reference's single-request depthany_compute, vision.cpp:137-168,
    scaled by the chip count over ICI)."""

    def run(weights, x_u8):
        from ..ops.preprocess import normalize_u8

        x = normalize_u8(x_u8, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return depthany_predict(Params(weights), x, p, flash=flash)

    if mesh is not None:
        from ..parallel import batch_sharding

        bs = batch_sharding(mesh)
        return jax.jit(run, in_shardings=(None, bs), out_shardings=bs)
    return jax.jit(run)


class DepthAnythingModel:
    """High-level handle with shape-keyed graph cache (reference
    depthany_model + rebuild-on-extent-change, vision.cpp:137-168).

    ``mesh``: optional jax.sharding.Mesh — weights replicate over the mesh
    (DINOv2 qkv/mlp tp-shard when the mesh's tp axis > 1) and a mesh-aware
    ImageServer dp-shards the grouped request batch."""

    def __init__(self, params: dict, p: DepthAnythingParams, device: Device, mesh=None):
        from ..core.weights import cast_float_params

        self.p = p
        self.device = device
        self.mesh = mesh
        params = cast_float_params(params, device.preferred_float_type)
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        from ..core.graph import GraphCache

        self._graphs = GraphCache(self._build)

    def _build(self, sharded: bool = False):
        from ..core.device import BuildFlag

        flash = bool(self.device.flags & BuildFlag.flash_attention)
        return _depthany_program(
            self.p,
            self.device.preferred_float_type,
            flash,
            self.mesh if sharded else None,
        )

    def _fn(self, extent, sharded: bool = False):
        """``sharded``: dp-shard the batch over the model's mesh (batch must
        divide by the mesh's dp extent; single-image ``compute`` always uses
        the unsharded program)."""
        return self._graphs.get((extent, sharded), sharded)

    def compute(self, image: Image) -> Image:
        extent = depthany_image_extent(image.extent, self.p)
        img = image if image.extent == extent else image_scale(image, extent, preprocess_scale_method())
        a = img.to_rgb_u8()
        fn = self._fn(extent)
        y = fn(self.params, jnp.asarray(a[None]))
        depth = np.asarray(y.astype(jnp.float32))[0]
        out = Image(np.ascontiguousarray(depth), ImageFormat.alpha_f32)
        out = image_normalize(out)
        if out.extent != image.extent:
            out = image_scale(out, image.extent, preprocess_scale_method())
        return out


def depthany_process_input(image: Image, p: DepthAnythingParams) -> np.ndarray:
    """Resize to the snapped extent + ImageNet normalize, host-side f32
    (reference depthany_process_input, depth-anything.cpp:130-140). The
    DepthAnythingModel path fuses the normalize on device."""
    extent = depthany_image_extent(image.extent, p)
    if image.extent != extent:
        image = image_scale(image, extent, preprocess_scale_method())
    out = image_u8_to_f32(
        image,
        ImageFormat.rgb_f32,
        offset=tuple(-m for m in IMAGENET_MEAN),
        scale=tuple(1.0 / s for s in IMAGENET_STD),
    )
    return out.data


def depthany_process_output(depth: np.ndarray, target_extent: tuple[int, int]) -> Image:
    """(H, W) or (H, W, 1) raw depth -> min-max normalized alpha f32 at the
    original extent (reference depthany_process_output,
    depth-anything.cpp:142-149)."""
    if depth.ndim == 2:
        depth = depth[:, :, None]
    out = Image(np.ascontiguousarray(depth.astype(np.float32)), ImageFormat.alpha_f32)
    out = image_normalize(out)
    if out.extent != tuple(target_extent):
        out = image_scale(out, tuple(target_extent), preprocess_scale_method())
    return out


def depthany_load_model(
    filepath: str, device: Device | None = None, mesh=None
) -> DepthAnythingModel:
    """``mesh``: place weights on a device mesh for multi-chip serving
    (quantized residency is single-chip only; a mesh forces dequant)."""
    device = device or backend_init()
    keep_q = bool(device.flags & BuildFlag.keep_quantized)
    file = model_load(filepath)
    p = depthany_detect_params(file)
    params = load_weights(file, device=None, as_numpy=True, keep_quantized=keep_q and mesh is None)
    params = fixup_weights(file, params)
    dtype = device.preferred_float_type
    out = {}
    for k, v in params.items():
        if is_quant(v):
            out[k] = v.astype(dtype).put(device.jax_device)
            continue
        if mesh is not None:
            out[k] = np.asarray(v, dtype) if np.issubdtype(v.dtype, np.floating) else v
            continue
        a = jax.device_put(
            v.astype(np.float32) if np.issubdtype(v.dtype, np.floating) else v, device.jax_device
        )
        out[k] = a.astype(dtype if np.issubdtype(v.dtype, np.floating) else v.dtype)
    return DepthAnythingModel(out, p, device, mesh=mesh)


def depthany_compute(model: DepthAnythingModel, image: Image) -> Image:
    return model.compute(image)
