"""MI-GAN inpainting (StyleGAN2-ish encoder + synthesis ladder).

TPU-native re-design of the reference (src/visp/arch/migan.{cpp,h},
src/visp/vision.cpp:170-203):

  * `lrelu_agc` — leaky-relu + gain + clamp (migan.cpp:17-26)
  * `downsample_2d` — fixed smoothing filter as depthwise conv stride 2
  * `upsample_2d` — nearest 2x * filter_const, depthwise 4x4 filter pad 2,
    crop right/bottom (migan.cpp:32-51)
  * `separable_conv_2d` — depthwise + 1x1 with optional act/up/down/noise
    (migan.cpp:53-84); noise is a baked const * learned strength
  * encoder: fromrgb + ladder b{res}..b4, collecting skip features
  * synthesis: ladder b4..b{res} with skip adds and to-rgb accumulation
  * pre/post: image+mask -> 4ch [alpha-0.5, alpha*(2rgb-1)] input
    (migan.cpp:142-157); output * 0.5 + 0.5 -> u8 with alpha from mask
    (vision.cpp:197-203). Both fused into the jitted program — the host
    touches pixels once each way.

Weight names match the original MI-GAN checkpoints the reference converter
passes through unchanged (convert.py:482-497).
"""

from __future__ import annotations

import math
from functools import lru_cache
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device import BuildFlag, Device, backend_init
from ..core.errors import raise_error
from ..core.gguf import GGUFFile, model_load
from ..core.params import Params
from ..core.weights import load_weights
from ..image import (
    Image,
    ImageFormat,
    image_load_array,
    image_scale,
    image_set_alpha,
    preprocess_scale_method,
)
from ..ops import conv_2d, conv_2d_depthwise, leaky_relu, resize_nhwc

__all__ = [
    "MiganParams",
    "migan_detect_params",
    "migan_generate",
    "migan_process_input",
    "migan_process_output",
    "MiganModel",
    "migan_load_model",
    "migan_compute",
]

_SQRT2 = 1.4142135623


@dataclass(frozen=True)
class MiganParams:
    resolution: int = 256
    invert_mask: bool = True


def migan_detect_params(file: GGUFFile) -> MiganParams:
    if file.arch != "migan":
        raise_error("Architecture expected to be 'migan', but was '{}' ({})", file.arch, file.path)
    return MiganParams(resolution=file.get_int("migan.image_size"))


def lrelu_agc(x, alpha: float = 0.2, gain: float = 1.0, clamp: float = 0.0):
    x = leaky_relu(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp != 0.0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def downsample_2d(p: Params, x):
    return conv_2d_depthwise(p["filter"], x, stride=2, pad=1)


def upsample_2d(p: Params, x):
    """nearest 2x * filter_const -> depthwise 4x4 pad 2 -> crop r/b
    (reference migan.cpp:32-51)."""
    n, h, w, c = x.shape
    x = resize_nhwc(x, (h * 2, w * 2), "nearest")
    filt = p.weight("filter_const")  # (H2, W2) spatial map
    x = x * filt[None, :, :, None].astype(x.dtype)
    x = conv_2d_depthwise(p["filter"], x, stride=1, pad=2)
    return x[:, :-1, :-1, :]


def separable_conv_2d(
    p: Params, x, activation=False, downsample=False, upsample=False, noise=False
):
    """Depthwise + pointwise conv pair with optional resampling/noise
    (reference migan.cpp:53-84)."""
    k = p["conv1"].weight("weight").shape[2]
    x = conv_2d_depthwise(p["conv1"], x, stride=1, pad=k // 2)
    if activation:
        x = lrelu_agc(x, 0.2, _SQRT2, 256)
    if downsample:
        x = downsample_2d(p["downsample"], x)
    x = conv_2d(p["conv2"], x)
    if upsample:
        x = upsample_2d(p["upsample"], x)
    if noise:
        n = p.weight("noise_const") * p.weight("noise_strength")
        x = x + n[None, :, :, None].astype(x.dtype)
    if activation:
        x = lrelu_agc(x, 0.2, _SQRT2, 256)
    return x


def from_rgb(p: Params, x):
    x = conv_2d(p["fromrgb"], x)
    return lrelu_agc(x, 0.2, _SQRT2, 256)


def encoder_block(p: Params, x, downsample=False):
    feat = separable_conv_2d(p["conv1"], x, activation=True)
    x = separable_conv_2d(p["conv2"], feat, activation=True, downsample=downsample)
    return x, feat


def encode(p: Params, x, res: int):
    """Encoder ladder res -> 4 (reference migan.cpp:96-109)."""
    n = int(math.log2(res)) - 1
    assert (1 << (n + 1)) == res
    x = from_rgb(p[f"b{res}"], x)
    feats = []
    for i in range(n - 1):
        x, f = encoder_block(p[f"b{res >> i}"], x, downsample=True)
        feats.append(f)
    x, f = encoder_block(p["b4"], x)
    feats.append(f)
    return x, feats


def synthesis_block(p: Params, x, feat, img, upsample=False, noise=False):
    """(reference migan.cpp:111-125)."""
    x = separable_conv_2d(p["conv1"], x, activation=True, upsample=upsample, noise=noise)
    x = x + feat
    x = separable_conv_2d(p["conv2"], x, activation=True, noise=noise)
    if img is not None:
        img = upsample_2d(p["upsample"], img)
    y = conv_2d(p["torgb"], x)
    img = y if img is None else img + y
    return x, img


def synthesis(p: Params, x, feats, res: int):
    """Synthesis ladder 4 -> res (reference migan.cpp:127-140)."""
    n = int(math.log2(res)) - 1
    x, img = synthesis_block(p["b4"], x, feats[n - 1], None)
    for i in range(n - 2, -1, -1):
        x, img = synthesis_block(p[f"b{res >> i}"], x, feats[i], img, upsample=True, noise=True)
    return img


def migan_generate(params: Params, image, p: MiganParams):
    """Full generator: (N, res, res, 4) -> (N, res, res, 3)
    (reference migan_generate, migan.cpp:166-170)."""
    x, feats = encode(params["encoder"], image, p.resolution)
    return synthesis(params["synthesis"], x, feats, p.resolution)


def migan_process_input(image: Image, mask: Image, p: MiganParams) -> np.ndarray:
    """image+mask -> (res, res, 4) = [alpha-0.5, alpha*(2rgb-1)]
    (reference migan_process_input, migan.cpp:142-157,181-205)."""
    res = (p.resolution, p.resolution)
    if image.extent != res:
        image = image_scale(image, res, preprocess_scale_method())
    if mask.extent != res:
        mask = image_scale(mask, res, preprocess_scale_method())
    rgb = image.load_f32x4()[:, :, :3]
    alpha = mask.load_f32x4()[:, :, :1]
    if p.invert_mask:
        alpha = 1.0 - alpha
    color = alpha * (rgb * 2.0 - 1.0)
    return np.concatenate([alpha - 0.5, color], axis=2).astype(np.float32)


def migan_process_output(raw: np.ndarray, image: Image, mask: Image) -> Image:
    """Raw generator output (res, res, 3) in [-1, 1] -> rgba u8 at the
    original extent with the mask injected as alpha (reference
    migan_process_output, migan.cpp:197-206 + vision.cpp:183-203)."""
    from ..image import image_f32_to_u8

    out_img = Image(np.ascontiguousarray(raw.astype(np.float32)), ImageFormat.rgb_f32)
    if out_img.extent != image.extent:
        out_img = image_scale(out_img, image.extent, preprocess_scale_method())
    result = image_f32_to_u8(out_img, ImageFormat.rgba_u8, scale=0.5, offset=0.5)
    mask_r = mask if mask.extent == image.extent else image_scale(mask, image.extent, preprocess_scale_method())
    md = mask_r.data[:, :, :1]
    if np.issubdtype(md.dtype, np.floating):
        # float masks are [0,1]; a bare u8 cast would truncate to 0/1 and
        # return an almost fully transparent composite
        md = (np.clip(md, 0.0, 1.0) * 255.0).astype(np.uint8)
    image_set_alpha(result, image_load_array(md, ImageFormat.alpha_u8))
    return result


@lru_cache(maxsize=8)
def _migan_program(pp: MiganParams, dtype, mesh=None):
    """Jitted generate shared across model instances. With ``mesh``, the
    (image, mask) batch is dp-sharded so N chips each inpaint batch/N
    requests (the reference's single-request migan_compute,
    vision.cpp:172-205, scaled by the chip count over ICI)."""

    def run(weights, img_u8, mask_u8):
        # device-side preprocess (reference migan::preprocess,
        # migan.cpp:142-157): [alpha-0.5, alpha*(2rgb-1)]
        rgb = img_u8.astype(jnp.float32) / 255.0
        alpha = mask_u8.astype(jnp.float32) / 255.0
        if pp.invert_mask:
            alpha = 1.0 - alpha
        color = alpha * (rgb * 2.0 - 1.0)
        x = jnp.concatenate([alpha - 0.5, color], axis=-1).astype(dtype)
        return migan_generate(Params(weights), x, pp)

    if mesh is not None:
        from ..parallel import batch_sharding

        bs = batch_sharding(mesh)
        return jax.jit(run, in_shardings=(None, bs, bs), out_shardings=bs)
    return jax.jit(run)


class MiganModel:
    """High-level handle (reference migan_model + migan_compute,
    vision.cpp:172-205).

    ``mesh``: optional jax.sharding.Mesh — weights replicate over the mesh
    and a mesh-aware ImageServer dp-shards the grouped request batch via
    ``_run_sharded`` (single-request ``compute`` stays unsharded)."""

    def __init__(self, params: dict, p: MiganParams, device: Device, mesh=None):
        from ..core.weights import cast_float_params

        self.p = p
        self.device = device
        self.mesh = mesh
        params = cast_float_params(params, device.preferred_float_type)
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self._run = _migan_program(self.p, device.preferred_float_type)
        self._run_sharded = (
            _migan_program(self.p, device.preferred_float_type, mesh) if mesh is not None else self._run
        )

    def compute(self, image: Image, mask: Image) -> Image:
        res = (self.p.resolution, self.p.resolution)
        img_r = image if image.extent == res else image_scale(image, res, preprocess_scale_method())
        mask_r = mask if mask.extent == res else image_scale(mask, res, preprocess_scale_method())
        a = img_r.to_rgb_u8()
        m = mask_r.data[:, :, :1]
        if np.issubdtype(m.dtype, np.floating):
            m = (np.clip(m, 0.0, 1.0) * 255.0).astype(np.uint8)
        y = self._run(self.params, jnp.asarray(a[None]), jnp.asarray(m[None]))
        out = np.asarray(y.astype(jnp.float32))[0]
        return migan_process_output(out, image, mask)


def migan_load_model(filepath: str, device: Device | None = None, mesh=None) -> MiganModel:
    """``mesh``: place weights on a device mesh for multi-chip serving
    (quantized residency is single-chip only; a mesh forces dequant)."""
    device = device or backend_init()
    file = model_load(filepath)
    p = replace(migan_detect_params(file), invert_mask=True)
    if mesh is not None:
        params = load_weights(file, device=None, as_numpy=True, keep_quantized=False)
        dtype = device.preferred_float_type
        params = {
            k: np.asarray(v, dtype) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in params.items()
        }
        return MiganModel(params, p, device, mesh=mesh)
    params = load_weights(
        file, device, keep_quantized=bool(device.flags & BuildFlag.keep_quantized)
    )
    return MiganModel(params, p, device)


def migan_compute(model: MiganModel, image: Image, mask: Image) -> Image:
    return model.compute(image, mask)
