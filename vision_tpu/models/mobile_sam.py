"""MobileSAM — promptable segmentation (TinyViT encoder + SAM decoder).

TPU-native re-provision of the reference (src/visp/arch/mobile-sam.{cpp,h},
high-level path src/visp/vision.cpp:24-95):

  * TinyViT image encoder: conv stem (MBConv stages), 3 windowed-attention
    stages with precomputed relative-bias tables (`attention_biases_indexed`,
    baked at conversion, convert.py:250-262), patch merging with the
    stride-1-vs-2 trick keyed off channel count (mobile-sam.cpp:94-113),
    256x64x64 neck.
  * prompt encoder: random-Fourier positional encoding of points/boxes
    (mobile-sam.cpp:238-284).
  * mask decoder: two-way transformer (2 blocks of self-attn + bidirectional
    cross-attn), 4x conv-transpose upscaling, hypernetwork MLPs -> mask
    logits + IoU head (mobile-sam.cpp:418-478).
  * pre/post: resize-longest-side to 1024 + ImageNet normalize
    (mobile-sam.cpp:533-547); mask postprocess = double bilinear upsample
    256->1024->original + >0 threshold (mobile-sam.cpp:480-583); best mask
    by max IoU over the first 3 predictions (vision.cpp:80-84).

All weights keep the GGUF names produced by the reference converter
(`enc.*`, `dec.*`, `prompt_encoder.*`; conv+BN pairs pre-fused into
`*.c.weight/bias`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

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
    image_load_array,
    image_scale,
    image_u8_to_f32,
    preprocess_scale_method,
)
from ..ops import (
    conv_2d,
    conv_2d_depthwise,
    conv_transpose_2d,
    gelu,
    layer_norm,
    linear,
    relu,
)
from ..ops.nn import attention_core, attention_windows

__all__ = [
    "SamParams",
    "TinyVitParams",
    "tiny_vit",
    "sam_encode_image",
    "sam_encode_points",
    "sam_encode_box",
    "sam_predict_mask",
    "sam_process_input",
    "sam_process_point",
    "sam_process_box",
    "sam_process_mask",
    "resize_longest_side",
    "SamModel",
    "sam_load_model",
]


@dataclass(frozen=True)
class SamParams:
    image_size: int = 1024
    mask_size: int = 256


@dataclass(frozen=True)
class TinyVitLayer:
    resolution: int
    embed_dim: int
    depth: int
    num_heads: int
    window_size: int
    downsample: bool


@dataclass(frozen=True)
class TinyVitParams:
    """Hardcoded 4-stage TinyViT-5M config (reference mobile-sam.h:16-38)."""

    img_size: int = 1024
    layers: tuple[TinyVitLayer, ...] = (
        TinyVitLayer(256, 64, 2, 2, 7, True),
        TinyVitLayer(128, 128, 2, 4, 7, True),
        TinyVitLayer(64, 160, 6, 5, 14, True),
        TinyVitLayer(64, 320, 2, 10, 7, False),
    )


def conv_2d_bn(p: Params, x, stride: int = 1, pad: int = 0):
    """Conv with BN fused at conversion (reference mobile-sam.cpp:15-18)."""
    return conv_2d(p["c"], x, stride, pad)


def conv_2d_dw_bn(p: Params, x, stride: int = 1, pad: int = 0):
    return conv_2d_depthwise(p["c"], x, stride, pad)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nw, win*win, C) with zero pad (mobile-sam.cpp:25-44)."""
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nh, nw = (h + ph) // window, (w + pw) // window
    x = x.reshape(b, nh, window, nw, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b * nh * nw, window * window, c)


def window_reverse(x, w: int, h: int, window: int):
    """Inverse of window_partition (mobile-sam.cpp:46-65)."""
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    nh, nw = (h + ph) // window, (w + pw) // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h + ph, w + pw, c)
    return x[:, :h, :w, :]


def patch_embed(p: Params, x):
    """Conv stem (mobile-sam.cpp:71-76)."""
    x = conv_2d_bn(p["seq"][0], x, 2, 1)
    x = gelu(x)
    x = conv_2d_bn(p["seq"][2], x, 2, 1)
    return x


def mb_conv(p: Params, x):
    """MBConv block (mobile-sam.cpp:78-92)."""
    shortcut = x
    x = gelu(conv_2d_bn(p["conv1"], x))
    x = gelu(conv_2d_dw_bn(p["conv2"], x, 1, 1))
    x = conv_2d_bn(p["conv3"], x)
    return gelu(x + shortcut)


def patch_merging(p: Params, x):
    """Downsample; stride trick keyed off channel count (mobile-sam.cpp:94-113).
    x: (B, H, W, C) -> (B, T, C_out)."""
    x = gelu(conv_2d_bn(p["conv1"], x))
    c_out = p["conv2"].weight("c.weight").shape[0]
    stride = 1 if c_out in (320, 448, 576) else 2
    x = gelu(conv_2d_dw_bn(p["conv2"], x, stride, 1))
    x = conv_2d_bn(p["conv3"], x)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def mlp(p: Params, x):
    """LN + fc1 + gelu + fc2 (mobile-sam.cpp:115-122)."""
    x = layer_norm(p["norm"], x)
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def attention_rel_bias(p: Params, x, dim: int, n_heads: int, flash: bool = False):
    """Windowed attention with precomputed relative bias (mobile-sam.cpp:124-132).
    x: (B, T, C); bias `attention_biases_indexed`: (heads, T, T).

    TPU-shaped formulation: the fused qkv weight is split into three (C, C)
    mats at trace time so q/k/v come out channel-compact, and the per-head
    attention runs as einsums directly on (B, T, H, hd) views — no head
    split/merge transposes, which measured as ~1/3 of the block time
    (scripts/exp_winattn3.py: 1.33 -> 0.90 ms per stage1 block, exact same
    numerics). Logits stay in the input dtype (f32 on the test path, bf16
    on TPU) with f32 softmax, mirroring the reference flash path's reduced
    precision (nn.cpp:221-227); `flash` is accepted for API parity but this
    path is already fused as far as XLA allows.
    """
    del flash
    scale = 1.0 / math.sqrt(dim / n_heads)
    bias = p.weight("attention_biases_indexed")  # (H, T, T)
    x = layer_norm(p["norm"], x)
    return attention_windows(p, x, n_heads, 1, bias[None], scale)


def tiny_vit_block(p: Params, x, resolution: int, dim: int, num_heads: int, window: int, flash=False):
    """(reference mobile-sam.cpp:134-161). x: (B, T, C)."""
    b, t, c = x.shape
    h = w = resolution
    res_x = x
    x = x.reshape(b, h, w, c)
    x = window_partition(x, window)
    x = attention_rel_bias(p["attn"], x, dim, num_heads, flash)
    x = window_reverse(x, w, h, window)
    x = x.reshape(b, t, c) + res_x
    y = x.reshape(b, h, w, c)
    y = conv_2d_dw_bn(p["local_conv"], y, 1, 1)
    x = y.reshape(b, t, c)
    return x + mlp(p["mlp"], x)


def conv_layer(p: Params, x, lp: TinyVitLayer):
    for i in range(lp.depth):
        x = mb_conv(p["blocks"][i], x)
    return patch_merging(p["downsample"], x)


def basic_layer(p: Params, x, lp: TinyVitLayer, flash=False):
    for i in range(lp.depth):
        x = tiny_vit_block(p["blocks"][i], x, lp.resolution, lp.embed_dim, lp.num_heads, lp.window_size, flash)
    if lp.downsample:
        b, t, c = x.shape
        x = x.reshape(b, lp.resolution, lp.resolution, c)
        x = patch_merging(p["downsample"], x)
    return x


def tiny_vit(p: Params, x, tp: TinyVitParams = TinyVitParams(), flash: bool = False):
    """TinyViT encoder -> (B, R, R, 256) embedding, R = final-stage
    resolution (64 for the production 1024 geometry; mobile-sam.cpp:185-208)."""
    x = patch_embed(p["patch_embed"], x)
    x = conv_layer(p["layers"][0], x, tp.layers[0])
    for i in range(1, len(tp.layers)):
        x = basic_layer(p["layers"][i], x, tp.layers[i], flash)
    b, t, c = x.shape
    res = tp.layers[-1].resolution
    x = x.reshape(b, res, res, c)
    x = conv_2d(p["neck"][0], x)
    x = layer_norm(p["neck"][1], x)
    x = conv_2d(p["neck"][2], x, 1, 1)
    x = layer_norm(p["neck"][3], x)
    return x


def sam_encode_image(
    params: Params,
    image,
    p: SamParams = SamParams(),
    flash: bool = False,
    tp: TinyVitParams = TinyVitParams(),
):
    """``tp``: encoder geometry — the production MobileSAM is the 1024
    default (reference mobile-sam.h:16-38 hardcodes it); non-default
    geometries (e.g. a halved 512 variant) encode fine but produce a
    different embedding resolution, which the 64x64 prompt decoder does
    not accept."""
    return tiny_vit(params["enc"], image, tp, flash)


# ---------------------------------------------------------------------------
# Prompt encoder (reference mobile-sam.cpp:214-288)
# ---------------------------------------------------------------------------


def resize_longest_side(extent: tuple[int, int], target: int) -> float:
    return float(target) / float(max(extent))


def _transform_coord(v: int, scale: float, image_size: int) -> float:
    return 2.0 * ((float(v) * scale + 0.5) / float(image_size)) - 1.0


def sam_process_point(point, extent, p: SamParams = SamParams()) -> np.ndarray:
    scale = resize_longest_side(extent, p.image_size)
    x = _transform_coord(point[0], scale, p.image_size)
    y = _transform_coord(point[1], scale, p.image_size)
    return np.array([[x, y], [0.0, 0.0]], np.float32)


def sam_process_box(top_left, bottom_right, extent, p: SamParams = SamParams()) -> np.ndarray:
    scale = resize_longest_side(extent, p.image_size)
    return np.array(
        [
            [_transform_coord(top_left[0], scale, p.image_size), _transform_coord(top_left[1], scale, p.image_size)],
            [_transform_coord(bottom_right[0], scale, p.image_size), _transform_coord(bottom_right[1], scale, p.image_size)],
        ],
        np.float32,
    )


def position_embedding_random(p: Params, coords):
    """coords (..., 2) @ gaussian matrix -> [sin, cos] (mobile-sam.cpp:238-248)."""
    pe = p.weight("positional_encoding_gaussian_matrix")  # (2, 128)
    c = jnp.matmul(coords.astype(jnp.float32), pe.astype(jnp.float32))
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def embed_points(p: Params, coords):
    """(n+1, 2) coords, last is sentinel -> (1, n+1, 256) (mobile-sam.cpp:250-266)."""
    count = coords.shape[0] - 1
    x = position_embedding_random(p["pe_layer"], coords)
    fg = x[:count] + p.weight("point_embeddings.1.weight").astype(x.dtype)
    sentinel = jnp.broadcast_to(p.weight("not_a_point_embed.weight").astype(x.dtype), (1, x.shape[-1]))
    return jnp.concatenate([fg, sentinel], axis=0)[None]


def embed_box(p: Params, coords):
    """(2, 2) corners -> (1, 2, 256) (mobile-sam.cpp:268-284)."""
    x = position_embedding_random(p["pe_layer"], coords)
    c1 = x[0:1] + p.weight("point_embeddings.2.weight").astype(x.dtype)
    c2 = x[1:2] + p.weight("point_embeddings.3.weight").astype(x.dtype)
    return jnp.concatenate([c1, c2], axis=0)[None]


def sam_encode_points(params: Params, coords):
    return embed_points(params["prompt_encoder"], coords)


def sam_encode_box(params: Params, coords):
    return embed_box(params["prompt_encoder"], coords)


# ---------------------------------------------------------------------------
# Mask decoder (reference mobile-sam.cpp:294-478)
# ---------------------------------------------------------------------------


def mlp_block(p: Params, x):
    return linear(p["lin2"], relu(linear(p["lin1"], x)))


def decoder_attention(p: Params, q, k, v, n_heads: int):
    """Projected multi-head attention (mobile-sam.cpp:307-319)."""
    q = linear(p["q_proj"], q)
    k = linear(p["k_proj"], k)
    v = linear(p["v_proj"], v)
    b, tq, c = q.shape
    hd = c // n_heads
    to_heads = lambda z: jnp.transpose(z.reshape(b, z.shape[1], n_heads, hd), (0, 2, 1, 3))
    scale = 1.0 / math.sqrt(hd)
    out = attention_core(to_heads(q), to_heads(k), to_heads(v), None, scale)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, tq, c)
    return linear(p["out_proj"], out)


def two_way_attention_block(p: Params, queries, keys, query_pe, key_pe, n_heads, skip_first_layer_pe):
    """(reference mobile-sam.cpp:321-362)."""
    if skip_first_layer_pe:
        queries = decoder_attention(p["self_attn"], queries, queries, queries, n_heads)
    else:
        q = queries + query_pe
        queries = queries + decoder_attention(p["self_attn"], q, q, queries, n_heads)
    queries = layer_norm(p["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + decoder_attention(p["cross_attn_t2i"], q, k, keys, n_heads)
    queries = layer_norm(p["norm2"], queries)

    queries = queries + mlp_block(p["mlp"], queries)
    queries = layer_norm(p["norm3"], queries)

    q = queries + query_pe
    keys = keys + decoder_attention(p["cross_attn_i2t"], k, q, queries, n_heads)
    keys = layer_norm(p["norm4"], keys)
    return queries, keys


def two_way_transformer(p: Params, image_embedding, image_pe, point_embedding, depth, n_heads):
    """(reference mobile-sam.cpp:364-395). image_embedding: (B, H, W, C)."""
    b, h, w, c = image_embedding.shape
    keys = image_embedding.reshape(b, h * w, c)
    image_pe = image_pe.reshape(1, h * w, c) if image_pe.ndim != 3 else image_pe
    queries = point_embedding
    for i in range(depth):
        queries, keys = two_way_attention_block(
            p["layers"][i], queries, keys, point_embedding, image_pe, n_heads, i == 0
        )
    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + decoder_attention(p["final_attn_t2i"], q, k, keys, n_heads)
    queries = layer_norm(p["norm_final_attn"], queries)
    return queries, keys


def upscale_outputs(p: Params, x):
    """2x conv-transpose ladder (mobile-sam.cpp:397-405)."""
    x = conv_transpose_2d(p[0], x, 2)
    x = layer_norm(p[1], x)
    x = gelu(x)
    x = conv_transpose_2d(p[3], x, 2)
    return gelu(x)


def hypernetwork_mlp(p: Params, x, num_layers: int):
    for i in range(num_layers):
        x = linear(p["layers"][i], x)
        if i < num_layers - 1:
            x = relu(x)
    return x


class SamPrediction(NamedTuple):
    masks: jnp.ndarray  # (B, 4, mask, mask) logits
    iou: jnp.ndarray  # (B, 4)


def predict_masks(p: Params, image_embeddings, sparse_prompt, dense_prompt) -> SamPrediction:
    """(reference sam::predict_masks, mobile-sam.cpp:418-478).
    image_embeddings: (1, 64, 64, 256); sparse_prompt: (B, n, 256);
    dense_prompt broadcastable to (B, 64, 64, 256)."""
    num_heads, depth, num_mask_tokens = 8, 2, 4
    bsz = sparse_prompt.shape[0]
    iou_token = p.weight("iou_token.weight")
    mask_tokens = p.weight("mask_tokens.weight")
    output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
    output_tokens = jnp.broadcast_to(output_tokens[None], (bsz, *output_tokens.shape))
    tokens = jnp.concatenate([output_tokens.astype(sparse_prompt.dtype), sparse_prompt], axis=1)

    src = jnp.broadcast_to(image_embeddings, (bsz, *image_embeddings.shape[1:]))
    src = src + jnp.reshape(dense_prompt.astype(src.dtype), (1, 1, 1, -1))
    image_pe = p.weight("dense_positional_embedding")  # (64, 64, 256)
    image_pe = image_pe.reshape(1, -1, image_pe.shape[-1]).astype(src.dtype)

    hs, out = two_way_transformer(p["transformer"], src, image_pe, tokens, depth, num_heads)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1 : num_mask_tokens + 1]

    b, hw, c = out.shape
    g = int(math.sqrt(hw))
    out = out.reshape(b, g, g, c)
    upscaled = upscale_outputs(p["output_upscaling"], out)
    b2, h2, w2, c2 = upscaled.shape
    upscaled = upscaled.reshape(b2, h2 * w2, c2)

    mlps = p["output_hypernetworks_mlps"]
    hyper = [hypernetwork_mlp(mlps[i], mask_tokens_out[:, i], 3) for i in range(num_mask_tokens)]
    hyper_in = jnp.stack(hyper, axis=1)  # (B, 4, c2)
    masks = jnp.einsum("bkc,bpc->bkp", hyper_in.astype(jnp.float32), upscaled.astype(jnp.float32))
    masks = masks.reshape(b2, num_mask_tokens, h2, w2)

    iou_pred = hypernetwork_mlp(p["iou_prediction_head"], iou_token_out, 3)
    return SamPrediction(masks, iou_pred)


def sam_predict_mask(params: Params, image_embed, prompt_embed) -> SamPrediction:
    dense = params["prompt_encoder"].weight("no_mask_embed.weight")
    return predict_masks(params["dec"], image_embed, prompt_embed, dense)


# ---------------------------------------------------------------------------
# Pre/post processing (reference mobile-sam.cpp:480-583, vision.cpp:54-95)
# ---------------------------------------------------------------------------

# shared rgb constants; image_u8_to_f32 pads the neutral 4th lane
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def sam_process_input_u8(image: Image, p: SamParams = SamParams()) -> np.ndarray:
    """Resize longest side to 1024 + replicate-pad, still uint8.
    Normalization runs on device (ops/preprocess.py)."""
    scale = resize_longest_side(image.extent, p.image_size)
    if scale != 1.0:
        target = (int(image.extent[0] * scale + 0.5), int(image.extent[1] * scale + 0.5))
        image = image_scale(image, target, preprocess_scale_method())
    a = image.to_rgb_u8()
    # replicate-pad to square (matches image_u8_to_f32's clamped tiled reads)
    ys = np.minimum(np.arange(p.image_size), a.shape[0] - 1)
    xs = np.minimum(np.arange(p.image_size), a.shape[1] - 1)
    return np.ascontiguousarray(a[np.ix_(ys, xs)])


def sam_process_input(image: Image, p: SamParams = SamParams()) -> np.ndarray:
    """Resize longest side to 1024, pad bottom/right, ImageNet normalize
    (host-side f32 variant, reference mobile-sam.cpp:533-547)."""
    scale = resize_longest_side(image.extent, p.image_size)
    if scale != 1.0:
        target = (int(image.extent[0] * scale + 0.5), int(image.extent[1] * scale + 0.5))
        image = image_scale(image, target, preprocess_scale_method())
    out = image_u8_to_f32(
        image,
        ImageFormat.rgb_f32,
        offset=tuple(-m for m in IMAGENET_MEAN),
        scale=tuple(1.0 / s for s in IMAGENET_STD),
        dst_extent=(p.image_size, p.image_size),
    )
    # the reference pads by replicate-reads (image_u8_to_f32 clamps);
    # same here via dst_extent > src extent
    return out.data


def _bilinear(a: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    from ..image.image import _bilinear_resize_f32

    return _bilinear_resize_f32(a, target)


def sam_process_mask(masks: np.ndarray, index: int, target_extent, p: SamParams = SamParams()) -> Image:
    """Double bilinear upsample + threshold (reference mobile-sam.cpp:557-583)."""
    mask = masks[index][:, :, None].astype(np.float32)  # (256, 256, 1)
    scaled_full = _bilinear(mask, (p.image_size, p.image_size))
    scale = resize_longest_side(target_extent, p.image_size)
    sw = int(target_extent[0] * scale + 0.5)
    sh = int(target_extent[1] * scale + 0.5)
    region = scaled_full[:sh, :sw]
    out = _bilinear(region, target_extent)
    return image_load_array((out[:, :, 0] > 0.0).astype(np.uint8) * 255, ImageFormat.alpha_u8)


# ---------------------------------------------------------------------------
# High-level model (reference sam_model + sam_encode/sam_compute)
# ---------------------------------------------------------------------------


def fixup_weights(file: GGUFFile, params: dict) -> dict:
    """Undo converter layout choices for whcn files (convert.py convert_sam):
    local_conv weights are ALWAYS stored cwhn; neck.0/neck.2 follow the
    conv2d_weights list (torch layout in whcn files, handled generically).
    Applies to whcn converter files only — cwhn files were un-permuted
    generically, "torch" files (train.export_gguf) are fully canonical."""
    if file.tensor_layout in ("cwhn", "torch"):
        return params
    out = dict(params)
    for name, a in params.items():
        if "local_conv" in name and a.ndim == 4 and name.endswith("weight"):
            out[name] = a.unpermute_cwhn(name) if is_quant(a) else unpermute_cwhn(name, a)
    return out


def _sam_enc_fn(dtype, flash: bool, tp: TinyVitParams = TinyVitParams()):
    def enc_fn(weights, x_u8):
        from ..ops.preprocess import normalize_u8

        x = normalize_u8(x_u8, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return sam_encode_image(Params(weights), x, flash=flash, tp=tp)

    return enc_fn


@lru_cache(maxsize=8)
def _sam_programs(dtype, flash: bool, tp: TinyVitParams = TinyVitParams()):
    """Jitted SAM executables shared across model instances. The closures
    depend only on (dtype, flash, encoder geometry) — weights are arguments
    — so two SamModel instances with the same config reuse ONE
    traced/compiled program instead of re-tracing per instance (the
    reference's per-model graph cache, vision.cpp:37-52, generalized
    across models)."""
    enc = jax.jit(_sam_enc_fn(dtype, flash, tp))

    @jax.jit
    def dec_point(weights, embed, coords):
        pp = Params(weights)
        prompt = sam_encode_points(pp, coords)
        return sam_predict_mask(pp, embed, prompt)

    @jax.jit
    def dec_box(weights, embed, coords):
        pp = Params(weights)
        prompt = sam_encode_box(pp, coords)
        return sam_predict_mask(pp, embed, prompt)

    @jax.jit
    def dec_point_batch(weights, embed, coords):  # coords: (P, 2, 2)
        pp = Params(weights)
        prompts = jax.vmap(lambda c: sam_encode_points(pp, c)[0])(coords)
        return sam_predict_mask(pp, embed, prompts)

    @jax.jit
    def dec_box_batch(weights, embed, coords):  # coords: (P, 2, 2)
        pp = Params(weights)
        prompts = jax.vmap(lambda c: sam_encode_box(pp, c)[0])(coords)
        return sam_predict_mask(pp, embed, prompts)

    return enc, dec_point, dec_box, dec_point_batch, dec_box_batch


class SamModel:
    def __init__(
        self,
        params: dict,
        p: SamParams,
        device: Device,
        mesh=None,
        tiny_vit: TinyVitParams = TinyVitParams(),
    ):
        """``mesh``: optional jax.sharding.Mesh for multi-chip inference —
        weights are placed on the mesh (replicated, or tp-sharded over the
        mesh's ``tp`` axis via the default rules) and ``encode_batch`` shards
        the image batch over ``dp``, scaling the reference's single-request
        semantics (vision.cpp:36-95) by the chip count over ICI.
        ``tiny_vit``: encoder geometry; non-default geometries change the
        embedding resolution, so compute()'s 64x64 prompt decode only works
        with the production 1024 default (see sam_encode_image)."""
        self.p = p
        self.device = device
        self.mesh = mesh
        self.tiny_vit = tiny_vit
        self.image_extent: tuple[int, int] | None = None
        self.embed = None

        from ..core.device import BuildFlag

        dtype = device.preferred_float_type
        flash = bool(device.flags & BuildFlag.flash_attention)

        from ..core.weights import cast_float_params

        params = cast_float_params(params, dtype)
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params

        enc, dec_point, dec_box, dec_point_batch, dec_box_batch = _sam_programs(
            dtype, flash, tiny_vit
        )
        self._enc_single = enc
        if mesh is not None:
            from ..parallel import batch_sharding

            enc = jax.jit(
                _sam_enc_fn(dtype, flash, tiny_vit),
                in_shardings=(None, batch_sharding(mesh)),
                out_shardings=batch_sharding(mesh),
            )
            # single-image encode() can't shard a batch of 1 over dp —
            # _enc_single stays the shared unsharded executable

        self._enc, self._dec_point, self._dec_box = enc, dec_point, dec_box
        self._dec_point_batch, self._dec_box_batch = dec_point_batch, dec_box_batch

    def encode(self, image: Image) -> None:
        """Run the encoder; embedding stays on device (reference sam_encode,
        vision.cpp:36-52 — the embed copy at vision.cpp:76 becomes a no-op)."""
        self.image_extent = image.extent
        x = sam_process_input_u8(image, self.p)
        self.embed = self._enc_single(self.params, jnp.asarray(x[None]))

    def encode_batch(self, images: list[Image]):
        """Encode a batch of images in one program; with a mesh, the batch is
        dp-sharded so each chip encodes len(images)/dp images and the result
        stays sharded on device. Returns the (N, R, R, 256) embeddings
        (R = 64 for the production geometry; see sam_encode_image)."""
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            assert len(images) % dp == 0, f"batch {len(images)} not divisible by dp={dp}"
        x = np.stack([sam_process_input_u8(img, self.p) for img in images])
        return self._enc(self.params, jnp.asarray(x))

    def compute(self, point=None, box=None) -> Image:
        """Predict a mask for a point or box prompt (vision.cpp:54-95)."""
        assert self.embed is not None, "Missing image embeds, call encode() first"
        if point is not None:
            coords = sam_process_point(point, self.image_extent, self.p)
            pred = self._dec_point(self.params, self.embed, jnp.asarray(coords))
        else:
            coords = sam_process_box(box[0], box[1], self.image_extent, self.p)
            pred = self._dec_box(self.params, self.embed, jnp.asarray(coords))
        masks = np.asarray(pred.masks.astype(jnp.float32))[0]
        iou = np.asarray(pred.iou.astype(jnp.float32))[0]
        idx = int(np.argmax(iou[:3]))
        return sam_process_mask(masks, idx, self.image_extent, self.p)

    def compute_batch(self, points=None, boxes=None) -> list[Image]:
        """Predict masks for MANY prompts in one device call (TPU-native
        extension: the decoder's two-way transformer batches over prompts,
        amortizing the per-dispatch cost; the reference loops one prompt
        per compute, vision.cpp:54-95)."""
        assert self.embed is not None, "Missing image embeds, call encode() first"
        if points is not None:
            coords = np.stack([sam_process_point(p, self.image_extent, self.p) for p in points])
            fn = self._dec_point_batch
        else:
            coords = np.stack(
                [sam_process_box(b[0], b[1], self.image_extent, self.p) for b in boxes]
            )
            fn = self._dec_box_batch
        pred = fn(self.params, self.embed, jnp.asarray(coords))
        masks = np.asarray(pred.masks.astype(jnp.float32))
        ious = np.asarray(pred.iou.astype(jnp.float32))
        out = []
        for b in range(masks.shape[0]):
            idx = int(np.argmax(ious[b, :3]))
            out.append(sam_process_mask(masks[b], idx, self.image_extent, self.p))
        return out


def sam_load_model(
    filepath: str, device: Device | None = None, mesh=None, keep_quantized: bool | None = None
) -> SamModel:
    """``keep_quantized``: block-quantized tensors stay int8-resident on
    device and dequantize in-graph (core/quant.py) — defaults to the
    device's ``keep_quantized`` build flag (VISP_KEEP_QUANT). Single-chip
    only; a mesh forces the expanded path."""
    device = device or backend_init()
    if keep_quantized is None:
        keep_quantized = bool(device.flags & BuildFlag.keep_quantized)
    file = model_load(filepath)
    params = load_weights(
        file, device=None, as_numpy=True, keep_quantized=keep_quantized and mesh is None
    )
    params = fixup_weights(file, params)
    dtype = device.preferred_float_type
    out = {}
    for k, v in params.items():
        if is_quant(v):
            if "positional" in k:  # keep positional tables full-precision
                v = np.asarray(jax.device_get(v.dequant()), np.float32)
            else:
                out[k] = v.astype(dtype).put(device.jax_device)
                continue
        a = v if mesh is not None else jax.device_put(v, device.jax_device)
        if np.issubdtype(v.dtype, np.floating) and "positional" not in k:
            a = np.asarray(a, dtype) if mesh is not None else a.astype(dtype)
        out[k] = a
    return SamModel(out, SamParams(), device, mesh=mesh)
