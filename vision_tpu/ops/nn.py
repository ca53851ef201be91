"""NN building blocks — TPU-native re-provision of the reference nn layer
(src/visp/nn.{h,cpp}, SURVEY.md N1-N11).

Design contract:
  * activations are NHWC (N, H, W, C) or sequence-major (N, T, C); there is
    no WHCN/CWHN dual-layout machinery — the reference's layout converters
    (nn.cpp:21-60) collapse away because TPU/XLA convs are NHWC-native.
  * weights keep **torch-canonical shapes** straight from the GGUF loader:
    linear (O, I), conv (O, I, kH, kW), depthwise (C, 1, kH, kW),
    conv-transpose (I, O, kH, kW). Kernels are permuted to HWIO inside the
    op (bytes are tiny; XLA folds the transpose into the conv's layout
    assignment).
  * matmuls/convs run with f32 accumulation (`preferred_element_type`) so
    bf16 weights keep MXU-native speed without losing the reference's
    F32-accumulate semantics (nn.cpp:226-227).
  * ops take a `Params` view positioned at the module (reference model_ref),
    so call sites mirror the C++ (`linear(p["qkv"], x)`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core.errors import raise_error
from ..core.params import Params

__all__ = [
    "linear",
    "layer_norm",
    "layer_norm_direct",
    "conv_2d",
    "conv_2d_depthwise",
    "conv_transpose_2d",
    "batch_norm_2d",
    "patch_embed",
    "split_qkv",
    "attention",
    "gelu",
    "gelu_tanh",
    "gelu_erf",
    "silu",
    "leaky_relu",
    "sigmoid",
    "relu",
    "max_pool_2d",
    "avg_pool_2d",
    "pad_nhwc",
]

# ---------------------------------------------------------------------------
# activations (reference: ggml_gelu/silu/sigmoid/leaky_relu used across archs)
# ---------------------------------------------------------------------------

def gelu(x):
    # tanh form — the reference's ggml_gelu IS the tanh approximation
    # (ggml computes gelu via the tanh formula, fp16-tabled), so this is the
    # parity-faithful production default. It is also the TPU-fast one: the
    # exact-erf lowering costs 34% of SAM-encode throughput on v5e
    # (273 -> 180 img/s measured, NOTES.md round-4d) while the erf-vs-tanh
    # difference (~4e-4 peak) sits below bf16 rounding noise (~3e-3), so
    # exactness buys nothing on the bf16 compute path. Use gelu_erf for
    # torch-default-exact semantics.
    return jax.nn.gelu(x, approximate=True)


gelu_tanh = gelu  # explicit-name alias


def gelu_erf(x):
    # exact erf form (torch nn.GELU default) — slow on TPU (VPU polynomial);
    # kept for f32 exactness use cases, not the production model path.
    return jax.nn.gelu(x, approximate=False)


silu = jax.nn.silu
sigmoid = jax.nn.sigmoid
relu = jax.nn.relu


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


# ---------------------------------------------------------------------------
# N1 linear, N2 layer_norm, N8 batch_norm
# ---------------------------------------------------------------------------


def linear(p: Params, x):
    """y = x @ W^T + b (reference nn.cpp:6-12). W is (O, I).

    A LoRA adapter pair next to the weight (``lora_a (r, I)`` /
    ``lora_b (O, r)``, see vision_tpu.lora) contributes
    ``(x @ A^T) @ B^T`` — the lookup is trace-time, so models without
    adapters pay nothing. Adapters are cast to the activation dtype
    (tiny matmuls, MXU-native) with f32 accumulation like the base."""
    w = p.weight("weight")
    y = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
    a = p.find("lora_a")
    if a is not None:
        ba = p.weight("lora_b")
        h = jnp.matmul(x, a.astype(x.dtype).T, preferred_element_type=jnp.float32)
        y = y + jnp.matmul(
            h.astype(x.dtype), ba.astype(x.dtype).T, preferred_element_type=jnp.float32
        )
    y = y.astype(x.dtype)
    b = p.find("bias")
    if b is not None:
        y = y + b
    return y


def layer_norm_direct(x, weight, bias, eps: float = 1e-5):
    """Normalize over the last axis with f32 statistics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(p: Params, x, eps: float = 1e-5):
    """Reference nn.cpp:14-19 (ggml_norm + scale + shift)."""
    return layer_norm_direct(x, p.weight("weight"), p.weight("bias"), eps)


def batch_norm_2d(p: Params, x):
    """BN must be fused to mul+add at conversion (reference nn.cpp:150-164)."""
    if p.find("running_mean") is not None or p.find("running_var") is not None:
        raise_error("batch norm was not fused at conversion (running stats present)")
    return x * p.weight("weight") + p.weight("bias")


# ---------------------------------------------------------------------------
# N4-N6 convolutions (NHWC, HWIO kernels)
# ---------------------------------------------------------------------------


def _conv_nhwc(x, kernel_hwio, stride, padding, feature_group_count=1, lhs_dilation=None):
    return jax.lax.conv_general_dilated(
        x,
        kernel_hwio,
        window_strides=(stride, stride) if isinstance(stride, int) else stride,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )


def conv_2d(p: Params, x, stride: int = 1, pad: int = 0):
    """2D conv, torch-canonical (O,I,kH,kW) weight (reference nn.cpp:72-100).

    The reference's three CWHN strategies (1x1-as-matmul, direct, im2col)
    collapse into one lax.conv — XLA lowers 1x1 convs to matmuls on the MXU
    itself.

    A LoRA adapter pair next to the weight (``lora_a (r, I)`` /
    ``lora_b (O, r)``, attached by vision_tpu.lora to 1x1 convs — they ARE
    matmuls) contributes two rank-r 1x1 convs, the first carrying the base
    conv's stride/pad so the paths stay spatially aligned. Trace-time
    lookup: models without adapters pay nothing."""
    w = p.weight("weight")  # (O, I, kH, kW)
    k = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
    y = _conv_nhwc(x, k, stride, [(pad, pad), (pad, pad)]).astype(x.dtype)
    a = p.find("lora_a")
    if a is not None:
        ba = p.weight("lora_b")
        ka = a.astype(x.dtype).T[None, None]  # (1, 1, I, r) HWIO
        kb = ba.astype(x.dtype).T[None, None]  # (1, 1, r, O)
        h = _conv_nhwc(x, ka, stride, [(pad, pad), (pad, pad)]).astype(x.dtype)
        y = y + _conv_nhwc(h, kb, 1, [(0, 0), (0, 0)]).astype(x.dtype)
    b = p.find("bias")
    if b is not None:
        y = y + b
    return y


def conv_2d_depthwise(p: Params, x, stride: int = 1, pad: int = 0):
    """Depthwise conv, torch (C,1,kH,kW) weight (reference nn.cpp:102-115)."""
    w = p.weight("weight")
    c = w.shape[0]
    k = jnp.transpose(w, (2, 3, 1, 0))  # (kH, kW, 1, C)
    y = _conv_nhwc(x, k, stride, [(pad, pad), (pad, pad)], feature_group_count=c).astype(x.dtype)
    b = p.find("bias")
    if b is not None:
        y = y + b
    return y


def conv_transpose_2d(p: Params, x, stride: int = 1):
    """Transposed conv, pad 0, torch (I,O,kH,kW) weight (nn.cpp:117-129;
    ggml_conv_transpose_2d_p0). Expressed as an input-dilated conv with a
    spatially-flipped kernel — the standard XLA lowering."""
    w = p.weight("weight")  # (I, O, kH, kW)
    kh, kw = w.shape[2], w.shape[3]
    k = jnp.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))  # (kH, kW, I, O)
    y = _conv_nhwc(
        x,
        k,
        stride=1,
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
    ).astype(x.dtype)
    b = p.find("bias")
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# N9 patch embed
# ---------------------------------------------------------------------------


def patch_embed(p: Params, x, patch_size: int):
    """Patch-size conv + optional LN (reference nn.cpp:166-180).
    x: (N, H, W, C) with H, W divisible by patch_size -> (N, H/p, W/p, C')."""
    assert x.shape[1] % patch_size == 0 and x.shape[2] % patch_size == 0
    proj = "proj" if p.has("proj.weight") else "projection"
    x = conv_2d(p[proj], x, stride=patch_size)
    if p.has("norm.weight"):
        x = layer_norm(p["norm"], x)
    return x


# ---------------------------------------------------------------------------
# N10 split_qkv, N11 attention
# ---------------------------------------------------------------------------


def split_qkv(p: Params, x, n_heads: int, split_dim: int):
    """Fused qkv linear -> (q, k, v) each (B, heads, T, head_dim)
    (reference nn.cpp:182-208). split_dim selects the fused layout:
      1 -> per-head [q|k|v] interleaving (TinyViT style)
      2 -> global [q..|k..|v..] ordering (torch nn.Linear(3*dim) style)
    """
    b, t = x.shape[0], x.shape[1]
    qkv = linear(p, x)  # (B, T, 3C)
    c = qkv.shape[-1] // 3
    hd = c // n_heads
    if split_dim == 1:
        qkv = qkv.reshape(b, t, n_heads, 3, hd)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # (B,T,H,hd)
    elif split_dim == 2:
        qkv = qkv.reshape(b, t, 3, n_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B,T,H,hd)
    else:
        raise ValueError("Unsupported split_dim")
    to_bhtd = lambda z: jnp.transpose(z, (0, 2, 1, 3))
    return to_bhtd(q), to_bhtd(k), to_bhtd(v)


# -- attention routing policy (measurement-backed, NOTES.md rounds 1-2) ----
#
# | flash | mask | T_q          | route          | why (measured)            |
# |-------|------|--------------|----------------|---------------------------|
# | no    | any  | any          | naive          | reference parity semantics|
# | yes   | none | >= 1024      | pallas         | 1.3-1.4x on DINO / SAM3   |
# |       |      |              |                | globals (round-1 pass)    |
# | yes   | yes  | <= 512       | fused_logits   | windows 49..196: fused    |
# |       |      |              |                | libs == naive, but bf16   |
# |       |      |              |                | logits + f32 softmax cut  |
# |       |      |              |                | ~20% (exp_winattn)        |
# | yes   | else | else         | xla_fused      | jax.nn.dot_product_attention
# |       |      |              |                | (masked mid-size T /      |
# |       |      |              |                | unmasked small T)         |

PALLAS_MIN_T = 1024
FUSED_LOGIT_MAX_T = 512


def attention_route(t_q: int, has_mask: bool, flash: bool, pallas_ok: bool | None = None) -> str:
    """Resolve which attention implementation attention_core will use.
    Exposed (and test-asserted) so the policy lives in one place instead of
    inline magic thresholds."""
    if not flash:
        return "naive"
    if not has_mask and t_q >= PALLAS_MIN_T:
        if pallas_ok is None:
            from .pallas import pallas_available

            pallas_ok = pallas_available()
        if pallas_ok:
            return "pallas"
    if has_mask and t_q <= FUSED_LOGIT_MAX_T:
        return "fused_logits"
    return "xla_fused"


def attention_core(q, k, v, mask=None, scale: float | None = None, flash: bool = False):
    """softmax(q k^T * scale + mask) v with f32 accumulation
    (reference nn.cpp:210-237). q,k,v: (B, H, T, hd); mask broadcastable to
    (B, H, Tq, Tk). The `flash` flag routes to the fused attention path
    (XLA/pallas) per the policy table above (attention_route)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    route = attention_route(int(q.shape[2]), mask is not None, flash)
    if route == "pallas":
        from .pallas import flash_attention

        return flash_attention(q, k, v, scale=float(scale))
    if route == "fused_logits":
        attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2)) * jnp.asarray(scale, q.dtype)
        attn = attn + mask.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
    if route == "xla_fused":
        # jax.nn.dot_product_attention expects (B, T, H, D)
        bias = None
        if mask is not None:
            bias = jnp.broadcast_to(mask, (*mask.shape[:-2], q.shape[2], k.shape[2])).astype(q.dtype)
            while bias.ndim < 4:
                bias = bias[None]
        out = jax.nn.dot_product_attention(
            jnp.transpose(q, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            bias=bias,
            scale=scale,
        )
        return jnp.transpose(out, (0, 2, 1, 3))
    attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2), preferred_element_type=jnp.float32)
    attn = attn * scale
    if mask is not None:
        attn = attn + mask.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


def attention_windows(p: Params, x, n_heads: int, split_dim: int, mask, scale: float):
    """Windowed attention from the fused qkv weight WITHOUT head transposes.

    The fused qkv weight is split into three (C, C) mats at trace time so
    q/k/v come out channel-compact, and the per-head attention runs as
    einsums directly on (B, T, H, hd) views. The head split/merge
    transposes this removes measured as ~1/3 of a TinyViT window block
    (scripts/exp_winattn3.py: 1.33 -> 0.90 ms, identical numerics). Logits
    stay in the input dtype (f32 on the test path, bf16 on TPU) with f32
    softmax — mirroring the reference flash path's reduced-precision logits
    (nn.cpp:221-227).

    p: params with `qkv` and `proj` children; x: (B, T, C);
    mask: broadcastable to (B_or_1, heads, T, T) or None; returns (B, T, C).
    """
    b, t, c = x.shape
    hd = c // n_heads
    w = p["qkv"].weight("weight")
    bb = p["qkv"].weight("bias")
    if split_dim == 1:  # per-head [q|k|v] interleaving (TinyViT style)
        w3 = w.reshape(n_heads, 3, hd, c)
        b3 = bb.reshape(n_heads, 3, hd)
        wi = lambda i: w3[:, i].reshape(c, c)
        bi = lambda i: b3[:, i].reshape(c)
    elif split_dim == 2:  # global [q..|k..|v..] ordering (torch style)
        w3 = w.reshape(3, c, c)
        b3 = bb.reshape(3, c)
        wi = lambda i: w3[i]
        bi = lambda i: b3[i]
    else:
        raise ValueError("Unsupported split_dim")
    mm = lambda i: (
        jnp.matmul(x, wi(i).T.astype(x.dtype), preferred_element_type=jnp.float32)
        + bi(i).astype(jnp.float32)
    ).astype(x.dtype)
    qh = mm(0).reshape(b, t, n_heads, hd)
    kh = mm(1).reshape(b, t, n_heads, hd)
    vh = mm(2).reshape(b, t, n_heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * jnp.asarray(scale, x.dtype)
    if mask is not None:
        attn = attn + mask.astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, t, c)
    return linear(p["proj"], o)


def attention(p_out: Params, q, k, v, mask=None, scale: float | None = None, flash: bool = False):
    """Full shared attention incl. fused output projection (nn.cpp:210-244).
    Returns (B, T, C)."""
    x = attention_core(q, k, v, mask, scale, flash)
    b, h, t, hd = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * hd)
    return linear(p_out, x)


# ---------------------------------------------------------------------------
# pooling & padding (ggml_pool_2d, ggml_pad — yolo/sppelan etc.)
# ---------------------------------------------------------------------------


def max_pool_2d(x, kernel: int, stride: int | None = None, pad: int = 0):
    stride = stride or kernel
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def avg_pool_2d(x, kernel: int, stride: int | None = None, pad: int = 0, count_include_pad: bool = True):
    stride = stride or kernel
    xf = x.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        xf,
        0.0,
        jax.lax.add,
        (1, kernel, kernel, 1),
        (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    if count_include_pad or pad == 0:
        out = summed / (kernel * kernel)
    else:
        ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add,
            (1, kernel, kernel, 1), (1, stride, stride, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)],
        )
        out = summed / counts
    return out.astype(x.dtype)


def pad_nhwc(x, pad_h: tuple[int, int], pad_w: tuple[int, int], value: float = 0.0):
    return jnp.pad(
        x, ((0, 0), pad_h, pad_w, (0, 0)), mode="constant", constant_values=value
    )
