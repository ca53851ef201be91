"""BiRefNet — dichotomous image segmentation (SWIN backbone, deformable-ASPP
decoder, dual-scale encoding).

TPU-native re-provision of the reference (src/visp/arch/birefnet.{cpp,h},
high-level path src/visp/vision.cpp:97-135):

  * encoder: SWIN on the full image AND a half-scale image; per-level
    channel concat of the upscaled low branch, plus a pyramid concat into
    the deepest level (birefnet.cpp:43-73)
  * decoder: squeeze block; 4 stages of basic_decoder_block (conv_in +
    deformable-ASPP + conv_out) with gdt attention gating, lateral 1x1s and
    multi-scale image-patch injection (image_to_patches, birefnet.cpp:153-247)
  * deformable conv v2 via ops/deform.py (the fork-only ggml op)
  * dynamic resolution: extent snapped to multiples of 128 with an HBM-based
    clamp replacing the reference's Vulkan max_alloc heuristic
    (birefnet_image_extent, birefnet.cpp:288-305)

Weight names follow the reference converter's renames (convert.py
convert_birefnet): decoder_block->block, atrous_conv->conv,
offset_conv->offset, modulator_conv->modulator, regular_conv->conv; conv+BN
pairs pre-fused; deformable BN kept as mul/add `bn.weight/bias`.
"""

from __future__ import annotations

import math
from functools import lru_cache
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device import BuildFlag, Device, backend_init
from ..core.errors import raise_error
from ..core.gguf import GGUFFile, model_load
from ..core.params import Params
from ..core.quant import is_quant
from ..core.weights import load_weights, unpermute_cwhn
from ..image import (
    Image,
    ImageFormat,
    image_f32_to_u8,
    image_scale,
    image_u8_to_f32,
    preprocess_scale_method,
)
from ..ops import batch_norm_2d, conv_2d, relu, resize_nhwc, sigmoid
from ..ops.deform import deform_conv_2d, deform_conv_2d_shift
from .swin import SwinParams, swin_detect_params, swin_encode

__all__ = [
    "BirefnetParams",
    "birefnet_detect_params",
    "birefnet_image_extent",
    "birefnet_predict",
    "BirefnetModel",
    "birefnet_load_model",
    "birefnet_compute",
    "birefnet_process_input",
    "birefnet_process_output",
]

# shared rgb constants; image_u8_to_f32 pads the neutral 4th lane
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


@dataclass(frozen=True)
class BirefnetParams:
    image_size: int = 1024
    image_multiple: int = 32
    image_extent: tuple[int, int] = (1024, 1024)
    encoder: SwinParams = None


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def birefnet_image_extent(input_extent, p: BirefnetParams, max_alloc: int) -> tuple[int, int]:
    """(reference birefnet_image_extent, birefnet.cpp:288-305)."""
    if p.image_size != -1:
        return (p.image_size, p.image_size)
    w, h = input_extent
    req = w * h * 240 * 4
    if req > max_alloc:
        scale = math.sqrt(max_alloc / req)
        w = max(1, int(w * scale) - p.image_multiple)
        h = max(1, int(h * scale) - p.image_multiple)
    return (_next_multiple(w, p.image_multiple), _next_multiple(h, p.image_multiple))


def birefnet_batch_extent(input_extents, p: BirefnetParams, max_alloc: int) -> tuple[int, int]:
    """Shared processing extent for a fused batch: the elementwise max of
    the per-image capped extents, RE-capped — a wide image and a tall image
    each within the max_alloc area budget combine to a bucket that is not,
    so the cap must be re-applied to the combined extent."""
    extents = [birefnet_image_extent(e, p, max_alloc) for e in input_extents]
    return birefnet_image_extent(
        (max(e[0] for e in extents), max(e[1] for e in extents)), p, max_alloc
    )


def birefnet_detect_params(file: GGUFFile, dynamic_extent=(0, 0), max_alloc: int = 1 << 62) -> BirefnetParams:
    if file.arch != "birefnet":
        raise_error("Architecture expected to be 'birefnet', but was '{}' ({})", file.arch, file.path)
    p = BirefnetParams(
        image_size=file.get_int("birefnet.image_size"),
        image_multiple=file.get_int("birefnet.image_multiple"),
        encoder=swin_detect_params(file),
    )
    extent = birefnet_image_extent(dynamic_extent, p, max_alloc) if (p.image_size != -1 or dynamic_extent[0] > 0) else p.image_extent
    return BirefnetParams(p.image_size, p.image_multiple, extent, p.encoder)


# -- encoder (reference birefnet.cpp:20-73) --


def _upscale_to(x, target_hw):
    return resize_nhwc(x, target_hw, "bilinear", align_corners=True)


def encode(p: Params, x, sp: SwinParams, flash: bool = False):
    """Dual-scale SWIN encode + concat (birefnet.cpp:43-73)."""
    xs = swin_encode(p["bb"], x, sp, flash)
    n, h, w, _ = x.shape
    x_low = resize_nhwc(x, (h // 2, w // 2), "bilinear", align_corners=True)
    xs_low = swin_encode(p["bb"], x_low, sp, flash)
    for i in range(4):
        xs[i] = jnp.concatenate([xs[i], _upscale_to(xs_low[i], xs[i].shape[1:3])], axis=-1)
    h3, w3 = xs[3].shape[1:3]  # every pyramid level downsamples to level-3 dims
    xs[3] = jnp.concatenate(
        [
            resize_nhwc(xs[0], (h3, w3), "bilinear", True),
            resize_nhwc(xs[1], (h3, w3), "bilinear", True),
            resize_nhwc(xs[2], (h3, w3), "bilinear", True),
            xs[3],
        ],
        axis=-1,
    )
    return xs


# -- decoder (reference birefnet.cpp:79-248) --


def deformable_conv_2d_block(p: Params, x, stride: int = 1, pad: int = 0, shift_bound: int | None = None):
    """offset/modulator convs + deform conv (birefnet.cpp:83-91).
    ``shift_bound`` selects the gather-free bounded-offset path
    (deform_conv_2d_shift; 2.2-5x faster on TPU, exact while |offset| <= bound)."""
    offset = conv_2d(p["offset"], x, stride, pad)
    modulator = 2.0 * sigmoid(conv_2d(p["modulator"], x, stride, pad))
    w = p.weight("conv.weight")
    if shift_bound is not None:
        y = deform_conv_2d_shift(x, w, offset, modulator, stride, pad, bound=shift_bound)
    else:
        y = deform_conv_2d(x, w, offset, modulator, stride, pad)
    b = p.find("conv.bias")
    if b is not None:
        y = y + b
    return y


def global_avg_pool(p: Params, x):
    """(birefnet.cpp:93-107)."""
    m = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    m = conv_2d(p[1], m)
    return relu(m)


def aspp_module_deformable(p: Params, x, padding: int = 0, shift_bound: int | None = None):
    x = deformable_conv_2d_block(p["conv"], x, 1, padding, shift_bound)
    x = batch_norm_2d(p["bn"], x)
    return relu(x)


def aspp_deformable(p: Params, x, shift_bound: int | None = None):
    """(birefnet.cpp:116-137)."""
    kernel_sizes = (1, 3, 7)
    x1 = aspp_module_deformable(p["aspp1"], x, 0, shift_bound)
    deforms = [
        aspp_module_deformable(p["aspp_deforms"][i], x, kernel_sizes[i] // 2, shift_bound)
        for i in range(3)
    ]
    x5 = global_avg_pool(p["global_avg_pool"], x)
    x5 = _upscale_to(x5, x1.shape[1:3])
    x = jnp.concatenate([x1, *deforms, x5], axis=-1)
    x = conv_2d(p["conv1"], x)
    return relu(x)


def basic_decoder_block(p: Params, x, shift_bound: int | None = None):
    """(birefnet.cpp:139-145)."""
    x = relu(conv_2d(p["conv_in"], x, 1, 1))
    x = aspp_deformable(p["dec_att"], x, shift_bound)
    return conv_2d(p["conv_out"], x, 1, 1)


def simple_conv(p: Params, x):
    x = conv_2d(p["conv1"], x, 1, 1)
    return conv_2d(p["conv_out"], x, 1, 1)


def image_to_patches(x, out_h: int, out_w: int):
    """'b (hg h) (wg w) c -> b h w (c hg wg)' (birefnet.cpp:153-162,
    matching BiRefNet's image2patches rearrange)."""
    b, h, w, c = x.shape
    assert h % out_h == 0 and w % out_w == 0, "Grid must divide image size"
    gh, gw = h // out_h, w // out_w
    x = x.reshape(b, gh, out_h, gw, out_w, c)
    x = jnp.transpose(x, (0, 2, 4, 5, 1, 3))  # (b, h, w, c, gh, gw)
    return x.reshape(b, out_h, out_w, c * gh * gw)


def gdt_conv(p: Params, x):
    return relu(conv_2d(p[0], x, 1, 1))


def decode(p: Params, image, features, shift_bound: int | None = None):
    """4-stage FPN decoder with patch injection and gdt gating
    (reference birefnet::decode, birefnet.cpp:170-248)."""
    x1, x2, x3, x4 = features

    def inject(feat, blk_name):
        patches = image_to_patches(image, feat.shape[1], feat.shape[2])
        patches = simple_conv(p[blk_name], patches)
        return jnp.concatenate([feat, patches], axis=-1)

    x4 = inject(x4, "ipt_blk5")
    p4 = basic_decoder_block(p["block4"], x4, shift_bound)
    p4 = p4 * sigmoid(conv_2d(p["gdt_convs_attn_4"][0], gdt_conv(p["gdt_convs_4"], p4)))

    x3l = conv_2d(p["lateral_block4.conv"], x3)
    _p3 = _upscale_to(p4, x3l.shape[1:3]) + x3l
    _p3 = inject(_p3, "ipt_blk4")
    p3 = basic_decoder_block(p["block3"], _p3, shift_bound)
    p3 = p3 * sigmoid(conv_2d(p["gdt_convs_attn_3"][0], gdt_conv(p["gdt_convs_3"], p3)))

    x2l = conv_2d(p["lateral_block3.conv"], x2)
    _p2 = _upscale_to(p3, x2l.shape[1:3]) + x2l
    _p2 = inject(_p2, "ipt_blk3")
    p2 = basic_decoder_block(p["block2"], _p2, shift_bound)
    p2 = p2 * sigmoid(conv_2d(p["gdt_convs_attn_2"][0], gdt_conv(p["gdt_convs_2"], p2)))

    x1l = conv_2d(p["lateral_block2.conv"], x1)
    _p1 = _upscale_to(p2, x1l.shape[1:3]) + x1l
    _p1 = inject(_p1, "ipt_blk2")
    _p1 = basic_decoder_block(p["block1"], _p1, shift_bound)
    _p1 = _upscale_to(_p1, image.shape[1:3])
    p1_ipt = simple_conv(p["ipt_blk1"], image)
    _p1 = jnp.concatenate([_p1, p1_ipt], axis=-1)

    out = conv_2d(p["conv_out1"][0], _p1)
    return sigmoid(out)


def birefnet_predict(
    params: Params, image, p: BirefnetParams, flash: bool = False, deform_bound: int | None = None
):
    """(reference birefnet_predict, birefnet.cpp:252-261).
    image: (N, H, W, 3) normalized -> (N, H, W, 1) mask in [0,1]."""
    features = encode(params, image, p.encoder, flash)
    features[3] = basic_decoder_block(params["squeeze_module"][0], features[3], deform_bound)
    return decode(params["decoder"], image, features, deform_bound)


def fixup_weights(file: GGUFFile, params: dict) -> dict:
    """patch_embed conv is always stored cwhn (convert.py convert_birefnet).
    Applies to whcn converter files only — cwhn files were un-permuted
    generically, "torch" files (train.export_gguf) are fully canonical."""
    if file.tensor_layout in ("cwhn", "torch"):
        return params
    out = dict(params)
    for name, a in params.items():
        if "patch_embed" in name and a.ndim == 4 and name.endswith("weight"):
            out[name] = a.unpermute_cwhn(name) if is_quant(a) else unpermute_cwhn(name, a)
    return out


@lru_cache(maxsize=8)
def _birefnet_program(p: BirefnetParams, dtype, flash: bool, bound, mesh=None):
    """Jitted predict shared across model instances (weights are arguments;
    the closure depends only on hashable config). With ``mesh``, the image
    batch is dp-sharded over the mesh so N chips each predict batch/N masks
    (the reference's single-request birefnet_compute, vision.cpp:108-132,
    scaled by the chip count over ICI)."""

    def run(weights, x_u8):
        from ..ops.preprocess import normalize_u8

        x = normalize_u8(x_u8, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return birefnet_predict(Params(weights), x, p, flash=flash, deform_bound=bound)

    if mesh is not None:
        from ..parallel import batch_sharding

        bs = batch_sharding(mesh)
        return jax.jit(run, in_shardings=(None, bs), out_shardings=bs)
    return jax.jit(run)


class BirefnetModel:
    """High-level handle with extent-keyed graph cache (reference
    birefnet_model + vision.cpp:97-135).

    ``mesh``: optional jax.sharding.Mesh for multi-chip inference — weights
    are placed on the mesh (replicated; swin qkv/mlp tp-shard when the mesh
    has a tp axis > 1) and ``compute_batch`` / a mesh-aware ImageServer
    shard the request batch over ``dp``."""

    def __init__(self, params: dict, p: BirefnetParams, device: Device, mesh=None):
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
        bound = 2 if self.device.flags & BuildFlag.deform_shift else None
        return _birefnet_program(
            self.p,
            self.device.preferred_float_type,
            flash,
            bound,
            self.mesh if sharded else None,
        )

    def _fn(self, extent, sharded: bool = False):
        """``sharded``: dp-shard the batch over the model's mesh (batch must
        be a multiple of the mesh's dp extent; single-image ``compute`` always
        uses the unsharded program — a batch of 1 can't split over dp)."""
        return self._graphs.get((extent, sharded), sharded)

    def compute(self, image: Image) -> Image:
        extent = birefnet_image_extent(image.extent, self.p, self.device.max_alloc)
        img = image if image.extent == extent else image_scale(image, extent, preprocess_scale_method())
        a = img.to_rgb_u8()
        y = self._fn(extent)(self.params, jnp.asarray(a[None]))
        mask = np.asarray(y.astype(jnp.float32))[0]
        out = Image(np.ascontiguousarray(mask), ImageFormat.alpha_f32)
        if out.extent != image.extent:
            out = image_scale(out, image.extent, preprocess_scale_method())
        return image_f32_to_u8(out, ImageFormat.alpha_u8)

    def compute_batch(self, images: list[Image]) -> list[Image]:
        """Predict masks for a batch of images in ONE device program; with a
        mesh the batch dp-shards so each chip runs len(images)/dp predictions
        (multi-chip scaling of birefnet_compute, vision.cpp:108-132). All
        images share one processed extent bucket (the largest request's)."""
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            assert len(images) % dp == 0, f"batch {len(images)} not divisible by dp={dp}"
        extent = birefnet_batch_extent(
            [img.extent for img in images], self.p, self.device.max_alloc
        )
        arrs = []
        for img in images:
            scaled = img if img.extent == extent else image_scale(img, extent, preprocess_scale_method())
            arrs.append(scaled.to_rgb_u8())
        y = self._fn(extent, sharded=self.mesh is not None)(
            self.params, jnp.asarray(np.stack(arrs))
        )
        masks = np.asarray(y.astype(jnp.float32))
        return [birefnet_process_output(m, img.extent) for m, img in zip(masks, images)]


def birefnet_process_input(image: Image, p: BirefnetParams) -> np.ndarray:
    """Resize to the inference extent + ImageNet normalize, host-side f32
    (reference birefnet_process_input, birefnet.cpp:263-274). The
    BirefnetModel path fuses the normalize into the device program and
    only uses this modular form for reference-compatible pipelines."""
    if image.extent != p.image_extent:
        image = image_scale(image, p.image_extent, preprocess_scale_method())
    out = image_u8_to_f32(
        image,
        ImageFormat.rgb_f32,
        offset=tuple(-m for m in IMAGENET_MEAN),
        scale=tuple(1.0 / s for s in IMAGENET_STD),
    )
    return out.data


def birefnet_process_output(mask: np.ndarray, target_extent: tuple[int, int]) -> Image:
    """(H, W) or (H, W, 1) f32 sigmoid mask -> alpha u8 at the original
    extent (reference birefnet_process_output, birefnet.cpp:276-286)."""
    if mask.ndim == 2:
        mask = mask[:, :, None]
    out = Image(np.ascontiguousarray(mask.astype(np.float32)), ImageFormat.alpha_f32)
    if out.extent != tuple(target_extent):
        out = image_scale(out, tuple(target_extent), preprocess_scale_method())
    return image_f32_to_u8(out, ImageFormat.alpha_u8)


def birefnet_load_model(
    filepath: str, device: Device | None = None, dynamic_extent=(0, 0), mesh=None
) -> BirefnetModel:
    """``mesh``: place weights on a device mesh for multi-chip serving
    (quantized residency is single-chip only; a mesh forces dequant)."""
    device = device or backend_init()
    file = model_load(filepath)
    p = birefnet_detect_params(file, dynamic_extent, device.max_alloc)
    keep_q = bool(device.flags & BuildFlag.keep_quantized)
    params = load_weights(file, device=None, as_numpy=True, keep_quantized=keep_q and mesh is None)
    params = fixup_weights(file, params)
    dtype = device.preferred_float_type
    out = {}
    for k, v in params.items():
        if is_quant(v):
            out[k] = v.astype(dtype).put(device.jax_device)
            continue
        a = v if mesh is not None else jax.device_put(v, device.jax_device)
        if np.issubdtype(v.dtype, np.floating):
            a = np.asarray(a, dtype) if mesh is not None else a.astype(dtype)
        out[k] = a
    return BirefnetModel(out, p, device, mesh=mesh)


def birefnet_compute(model: BirefnetModel, image: Image) -> Image:
    return model.compute(image)
