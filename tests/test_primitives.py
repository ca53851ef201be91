"""NN primitive parity tests vs torch (reference tests/test_primitives.py
via the workbench mechanism, SURVEY.md §4.2)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.ops import (
    attention,
    avg_pool_2d,
    batch_norm_2d,
    conv_2d,
    conv_2d_depthwise,
    conv_transpose_2d,
    layer_norm,
    linear,
    max_pool_2d,
    patch_embed,
    resize_nhwc,
    split_qkv,
)

from workbench import (
    input_tensor,
    make_params,
    randomize,
    tensors_match,
    to_nchw,
    to_nhwc,
)


def test_linear():
    m = randomize(torch.nn.Linear(32, 48))
    x = input_tensor(2, 7, 32)
    expected = m(x)
    actual = linear(make_params(m), x.numpy())
    tensors_match(expected, actual, label="linear")


def test_linear_no_bias():
    m = randomize(torch.nn.Linear(16, 8, bias=False))
    x = input_tensor(3, 16)
    tensors_match(m(x), linear(make_params(m), x.numpy()), label="linear_nobias")


def test_layer_norm():
    m = randomize(torch.nn.LayerNorm(64))
    x = input_tensor(2, 5, 64)
    tensors_match(m(x), layer_norm(make_params(m), x.numpy()), label="layer_norm", atol=1e-4)


@pytest.mark.parametrize("stride,pad,k", [(1, 0, 1), (1, 1, 3), (2, 1, 3), (2, 3, 7), (4, 0, 4)])
def test_conv_2d(stride, pad, k):
    m = randomize(torch.nn.Conv2d(6, 10, k, stride=stride, padding=pad))
    x = input_tensor(2, 6, 16, 16)
    expected = to_nhwc(m(x))
    actual = conv_2d(make_params(m), to_nhwc(x), stride=stride, pad=pad)
    tensors_match(torch.from_numpy(expected), actual, label="conv2d", atol=1e-4)


def test_conv_2d_depthwise():
    m = randomize(torch.nn.Conv2d(8, 8, 3, padding=1, groups=8))
    x = input_tensor(2, 8, 12, 12)
    expected = to_nhwc(m(x))
    actual = conv_2d_depthwise(make_params(m), to_nhwc(x), stride=1, pad=1)
    tensors_match(torch.from_numpy(expected), actual, label="dwconv", atol=1e-4)


@pytest.mark.parametrize("stride,k", [(2, 2), (2, 4), (1, 3)])
def test_conv_transpose_2d(stride, k):
    m = randomize(torch.nn.ConvTranspose2d(6, 4, k, stride=stride))
    x = input_tensor(2, 6, 8, 8)
    expected = to_nhwc(m(x))
    actual = conv_transpose_2d(make_params(m), to_nhwc(x), stride=stride)
    tensors_match(torch.from_numpy(expected), actual, label="convT", atol=1e-4)


def test_batch_norm_2d_fused():
    """BN is fused to mul+add at conversion (reference nn.cpp:150-164)."""
    bn = randomize(torch.nn.BatchNorm2d(12))
    x = input_tensor(2, 12, 6, 6)
    expected = to_nhwc(bn(x))
    w = bn.weight / torch.sqrt(bn.running_var + bn.eps)
    b = bn.bias - bn.running_mean * w
    p = Params({"weight": w.detach().numpy(), "bias": b.detach().numpy()})
    actual = batch_norm_2d(p, to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="bn", atol=1e-4)


def test_patch_embed():
    class PE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Conv2d(3, 32, 4, stride=4)
            self.norm = torch.nn.LayerNorm(32)

        def forward(self, x):
            x = self.proj(x)  # (N,C,H,W)
            x = x.permute(0, 2, 3, 1)
            return self.norm(x)  # NHWC

    m = randomize(PE())
    x = input_tensor(1, 3, 16, 16)
    expected = m(x)
    actual = patch_embed(make_params(m), to_nhwc(x), patch_size=4)
    tensors_match(expected, actual, label="patch_embed", atol=1e-4)


class TorchAttention(torch.nn.Module):
    """Reference-style attention with fused qkv and both split layouts
    (matches reference nn.cpp:182-244 semantics)."""

    def __init__(self, dim, heads, split_dim):
        super().__init__()
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)
        self.heads = heads
        self.split_dim = split_dim

    def forward(self, x, mask=None):
        b, t, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x)
        if self.split_dim == 1:  # per-head interleave
            qkv = qkv.reshape(b, t, self.heads, 3, hd)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        else:  # standard torch layout
            qkv = qkv.reshape(b, t, 3, self.heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
        attn = (q @ k.transpose(-1, -2)) * hd**-0.5
        if mask is not None:
            attn = attn + mask
        attn = attn.softmax(-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, t, c)
        return self.proj(out)


@pytest.mark.parametrize("split_dim", [1, 2])
def test_split_qkv_attention(split_dim):
    m = randomize(TorchAttention(32, 4, split_dim))
    x = input_tensor(2, 9, 32)
    expected = m(x)
    p = make_params(m)
    q, k, v = split_qkv(p["qkv"], x.numpy(), n_heads=4, split_dim=split_dim)
    actual = attention(p["proj"], q, k, v)
    tensors_match(expected, actual, label=f"attn{split_dim}", atol=1e-4)


def test_attention_with_mask():
    m = randomize(TorchAttention(16, 2, 2))
    x = input_tensor(1, 6, 16)
    mask = torch.full((6, 6), 0.0)
    mask[:, 3:] = -torch.inf
    expected = m(x, mask)
    p = make_params(m)
    q, k, v = split_qkv(p["qkv"], x.numpy(), n_heads=2, split_dim=2)
    actual = attention(p["proj"], q, k, v, mask=mask.numpy())
    tensors_match(expected, actual, label="attn_mask", atol=1e-4)


def test_attention_flash_path():
    """Flash path must match naive within bf16-ish tolerance."""
    m = randomize(TorchAttention(64, 4, 2))
    x = input_tensor(2, 128, 64)
    expected = m(x)
    p = make_params(m)
    q, k, v = split_qkv(p["qkv"], x.numpy(), n_heads=4, split_dim=2)
    actual = attention(p["proj"], q, k, v, flash=True)
    tensors_match(expected, actual, label="flash", rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "mode,align,size",
    [
        ("bilinear", False, (14, 20)),
        ("bilinear", True, (14, 20)),
        ("bilinear", False, (5, 3)),
        ("bilinear", True, (5, 3)),
        ("bicubic", False, (16, 16)),
        ("bicubic", True, (16, 16)),
        ("nearest", False, (20, 12)),
        # n_out == 1: torch defines scale = 0 (source index 0), not the
        # half-pixel center (review r4c)
        ("bilinear", True, (1, 5)),
        ("bilinear", True, (4, 1)),
    ],
)
def test_resize_matches_torch(mode, align, size):
    x = input_tensor(2, 3, 8, 10)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    expected = F.interpolate(x, size=size, mode=mode, **kwargs)
    actual = resize_nhwc(to_nhwc(x), size, method=mode, align_corners=align)
    tensors_match(to_nchw(np.asarray(actual)), to_nchw(to_nhwc(expected)), label=f"resize-{mode}-{align}", atol=1e-4)


def test_max_pool():
    x = input_tensor(1, 4, 10, 10)
    expected = to_nhwc(F.max_pool2d(x, 5, stride=1, padding=2))
    actual = max_pool_2d(to_nhwc(x), 5, stride=1, pad=2)
    tensors_match(torch.from_numpy(expected), actual, label="maxpool", atol=1e-5)


def test_avg_pool():
    x = input_tensor(1, 4, 8, 8)
    expected = to_nhwc(F.avg_pool2d(x, 2, stride=1))
    actual = avg_pool_2d(to_nhwc(x), 2, stride=1)
    tensors_match(torch.from_numpy(expected), actual, label="avgpool", atol=1e-5)


@pytest.mark.parametrize("split_dim", [1, 2])
def test_attention_windows_matches_torch(split_dim):
    """The transpose-free fused path (ops.nn.attention_windows) must match
    the torch reference exactly — it is the production window-attention
    formulation for TinyViT (split_dim=1) and SWIN (split_dim=2)."""
    from vision_tpu.ops import attention_windows

    m = randomize(TorchAttention(32, 4, split_dim))
    x = input_tensor(3, 9, 32)
    mask = torch.randn(4, 9, 9)
    expected = m(x, mask)
    p = make_params(m)
    actual = attention_windows(p, x.numpy(), 4, split_dim, mask.numpy()[None], (32 / 4) ** -0.5)
    tensors_match(expected, actual, label=f"attn_windows{split_dim}", atol=1e-4)


def test_attention_flash_masked_small_t_matches_naive():
    """flash=True with a mask and T <= 512 routes through the reduced-
    precision logits branch; on f32 inputs (the test path) it must be
    numerically identical to the naive path."""
    from vision_tpu.ops.nn import attention_core

    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 2, 49, 16)).astype(np.float32)
    k = rng.standard_normal((2, 2, 49, 16)).astype(np.float32)
    v = rng.standard_normal((2, 2, 49, 16)).astype(np.float32)
    mask = rng.standard_normal((1, 2, 49, 49)).astype(np.float32)
    a = np.asarray(attention_core(q, k, v, mask, None, flash=False))
    b = np.asarray(attention_core(q, k, v, mask, None, flash=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_gelu_variants_match_torch():
    """ops.gelu is the tanh form — the reference's ggml_gelu IS the tanh
    approximation, and exact erf measured 34% slower on TPU SAM-encode
    (NOTES round-4d) for a difference below bf16 rounding noise. gelu_erf
    keeps torch's exact-erf default available; both are pinned to their
    torch counterparts at 2e-6 so neither can silently alias the other."""
    from vision_tpu.ops import gelu, gelu_erf, gelu_tanh

    x = torch.linspace(-4, 4, 257)
    got = np.asarray(gelu(x.numpy()))
    np.testing.assert_allclose(
        got, torch.nn.GELU(approximate="tanh")(x).numpy(), atol=2e-6
    )
    assert gelu_tanh is gelu  # explicit-name alias
    got_e = np.asarray(gelu_erf(x.numpy()))
    np.testing.assert_allclose(got_e, torch.nn.GELU()(x).numpy(), atol=2e-6)
    assert float(np.abs(got - got_e).max()) > 1e-4  # genuinely different forms


def test_nearest_resize_paths_agree():
    """The gather entry point and the matrix entry point share one index
    rule (review r4c: the formula was duplicated)."""
    from vision_tpu.ops.resize import _axis_weights, _nearest_indices

    for n_in, n_out in [(7, 3), (3, 7), (8, 8), (5, 1), (1, 5)]:
        w = _axis_weights(n_in, n_out, "nearest", False)
        np.testing.assert_array_equal(np.argmax(w, axis=1), _nearest_indices(n_in, n_out))


def test_batch_norm_unfused_raises():
    """Unfused BN (running stats present) raises the module's error type
    even under python -O (review r4c: was a bare assert)."""
    from vision_tpu.core.errors import VispError

    p = {
        "bn.weight": np.ones((4,), np.float32),
        "bn.bias": np.zeros((4,), np.float32),
        "bn.running_mean": np.zeros((4,), np.float32),
    }
    with pytest.raises(VispError, match="fused"):
        batch_norm_2d(Params(p)["bn"], np.zeros((1, 2, 2, 4), np.float32))
