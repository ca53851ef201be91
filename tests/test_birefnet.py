"""BiRefNet / SWIN parity tests (reference tests/test_birefnet.py pattern).
Torch replicas of SWIN v1 and the BiRefNet decoder (incl. a manual
deform_conv2d reference — torchvision is not available) vs the framework."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.models.birefnet import (
    BirefnetParams,
    aspp_deformable,
    basic_decoder_block,
    birefnet_image_extent,
    birefnet_predict,
    decode,
    deformable_conv_2d_block,
    encode,
    image_to_patches,
    simple_conv,
)
from vision_tpu.models.swin import (
    BlockParams,
    SwinLayerParams,
    SwinParams,
    block as swin_block,
    compute_attention_mask,
    patch_merging,
    swin_encode,
    window_attention,
)
from vision_tpu.ops.deform import deform_conv_2d

from workbench import input_tensor, make_params, randomize, tensors_match, to_nchw, to_nhwc


# ---------------------------------------------------------------------------
# deformable conv v2 — torch manual reference
# ---------------------------------------------------------------------------


def t_deform_conv2d(x, weight, offset, mask, stride=1, pad=1):
    """Manual torchvision-semantics deform_conv2d (zero padding outside)."""
    b, c, h, w = x.shape
    o, i, kh, kw = weight.shape
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    out = torch.zeros(b, o, ho, wo)
    ys = torch.arange(ho) * stride - pad
    xs = torch.arange(wo) * stride - pad
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        py = ys.view(1, ho, 1) + ky + offset[:, 2 * k]
        px = xs.view(1, 1, wo) + kx + offset[:, 2 * k + 1]
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        fy, fx = py - y0, px - x0
        acc = torch.zeros(b, c, ho, wo)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                iy = (y0 + dy).long()
                ix = (x0 + dx).long()
                inb = ((iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)).float()
                iyc = iy.clamp(0, h - 1)
                ixc = ix.clamp(0, w - 1)
                flat = (iyc * w + ixc).view(b, 1, -1).expand(b, c, ho * wo)
                g = torch.gather(x.reshape(b, c, -1), 2, flat).view(b, c, ho, wo)
                acc = acc + g * (inb * wy * wx).unsqueeze(1)
        if mask is not None:
            acc = acc * mask[:, k].unsqueeze(1)
        out = out + torch.einsum("bchw,oc->bohw", acc, weight[:, :, ky, kx])
    return out


@pytest.mark.parametrize("k,stride,pad", [(1, 1, 0), (3, 1, 1), (7, 1, 3), (3, 2, 1)])
def test_deform_conv_parity(k, stride, pad):
    g = torch.Generator().manual_seed(11)
    x = torch.randn(2, 5, 10, 12, generator=g)
    weight = torch.randn(7, 5, k, k, generator=g) * 0.2
    ho = (10 + 2 * pad - k) // stride + 1
    wo = (12 + 2 * pad - k) // stride + 1
    offset = torch.randn(2, 2 * k * k, ho, wo, generator=g) * 2.0
    mask = torch.rand(2, k * k, ho, wo, generator=g) * 2.0
    expected = t_deform_conv2d(x, weight, offset, mask, stride, pad)
    actual = deform_conv_2d(
        to_nhwc(x), weight.numpy(), to_nhwc(offset), to_nhwc(mask), stride, pad
    )
    tensors_match(torch.from_numpy(to_nhwc(expected)), actual, label=f"deform{k}", atol=1e-3)


def test_deform_conv_zero_offset_equals_conv():
    g = torch.Generator().manual_seed(12)
    x = torch.randn(1, 4, 8, 8, generator=g)
    weight = torch.randn(6, 4, 3, 3, generator=g)
    offset = torch.zeros(1, 18, 8, 8)
    expected = F.conv2d(x, weight, padding=1)
    actual = deform_conv_2d(to_nhwc(x), weight.numpy(), to_nhwc(offset), None, 1, 1)
    tensors_match(torch.from_numpy(to_nhwc(expected)), actual, label="deform_id", atol=1e-4)


# ---------------------------------------------------------------------------
# SWIN torch replica (public SWIN v1 semantics, as used by BiRefNet)
# ---------------------------------------------------------------------------


def t_win_part(x, window):
    b, h, w, c = x.shape
    x = x.view(b, h // window, window, w // window, window, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def t_win_rev(x, window, h, w):
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.view(b, h // window, w // window, window, window, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class TWindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.1
        )
        coords = torch.stack(torch.meshgrid(torch.arange(window), torch.arange(window), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("rel_index", rel.sum(-1), persistent=False)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        bw, n, c = x.shape
        qkv = self.qkv(x).reshape(bw, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(c / self.heads)
        bias = self.relative_position_bias_table[self.rel_index.view(-1)].view(n, n, self.heads)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.heads, n, n) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(bw, self.heads, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        return self.proj(out)


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        mlpm = nn.Module()
        mlpm.fc1 = nn.Linear(dim, dim * 4)
        mlpm.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlpm
        self.window, self.shift = window, shift

    def forward(self, x, h, w, mask_matrix=None):
        b, t, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        pad_r = (self.window - w % self.window) % self.window
        pad_b = (self.window - h % self.window) % self.window
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            attn_mask = mask_matrix
        else:
            attn_mask = None
        xw = t_win_part(x, self.window)
        xw = self.attn(xw, attn_mask)
        x = t_win_rev(xw, self.window, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :h, :w].reshape(b, t, c)
        x = shortcut + x
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x)), approximate="tanh"))
        return x


class TPatchMergingSwin(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, h, w):
        b, t, c = x.shape
        x = x.view(b, h, w, c)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(b, t // 4, 4 * c)
        return self.reduction(self.norm(x))


def t_attention_mask(h, w, window, shift):
    hp = math.ceil(h / window) * window
    wp = math.ceil(w / window) * window
    img_mask = torch.zeros((1, hp, wp, 1))
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = t_win_part(img_mask, window).view(-1, window * window)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, float("-inf")).masked_fill(attn_mask == 0, 0.0)
    return attn_mask


class TSwin(nn.Module):
    """4-stage SWIN with BiRefNet's norm{i} pyramid outputs."""

    def __init__(self, embed=8, window=3, depths=(2, 2, 2, 2), heads=(2, 2, 2, 2)):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, embed, 4, stride=4)
        pe.norm = nn.LayerNorm(embed)
        self.patch_embed = pe
        dims = [embed * (2**i) for i in range(4)]
        self.dims = dims
        layers = []
        for i in range(4):
            li = nn.Module()
            li.blocks = nn.ModuleList([
                TSwinBlock(dims[i], heads[i], window, 0 if j % 2 == 0 else window // 2)
                for j in range(depths[i])
            ])
            if i < 3:
                li.downsample = TPatchMergingSwin(dims[i])
            layers.append(li)
        self.layers = nn.ModuleList(layers)
        for i in range(4):
            setattr(self, f"norm{i}", nn.LayerNorm(dims[i]))
        self.window = window

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = []
        for i in range(4):
            li = self.layers[i]
            mask = t_attention_mask(h, w, self.window, self.window // 2)
            x_out = x
            for blk in li.blocks:
                x_out = blk(x_out, h, w, mask)
            out = getattr(self, f"norm{i}")(x_out)
            outs.append(out.view(b, h, w, self.dims[i]))
            if i < 3:
                x = li.downsample(x_out, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
        return outs


SWIN_TEST = SwinParams(
    embed_dim=8,
    window_size=3,
    layers=(
        SwinLayerParams(2, 2, 8),
        SwinLayerParams(2, 2, 16),
        SwinLayerParams(2, 2, 32),
        SwinLayerParams(2, 2, 64),
    ),
)


def test_swin_window_attention():
    t = randomize(TWindowAttention(8, 3, 2))
    x = input_tensor(4, 9, 8)
    expected = t(x)
    p = make_params(t)
    actual = window_attention(p, x.numpy(), None, 2, 3)
    tensors_match(expected, actual, label="win_attn", atol=1e-4)


def test_swin_window_attention_masked():
    t = randomize(TWindowAttention(8, 3, 2))
    mask = torch.from_numpy(compute_attention_mask(6, 6, 3))
    x = input_tensor(4, 9, 8)
    expected = t(x, mask)
    actual = window_attention(make_params(t), x.numpy(), np.asarray(mask), 2, 3)
    tensors_match(expected, actual, label="win_attn_mask", atol=1e-4)


def test_attention_mask_matches_torch():
    """Our 2-zone construction equals torch's 9-zone construction."""
    for (h, w, window) in [(6, 6, 3), (7, 5, 3), (12, 9, 3), (14, 14, 7)]:
        ours = compute_attention_mask(w, h, window)
        theirs = t_attention_mask(h, w, window, window // 2).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_array_equal(np.isneginf(ours), np.isneginf(theirs))


@pytest.mark.parametrize("shift", [0, 1])
def test_swin_block(shift):
    t = randomize(TSwinBlock(8, 2, 3, shift))
    x = input_tensor(1, 49, 8)  # 7x7, needs padding to 9x9
    mask = t_attention_mask(7, 7, 3, 1)
    expected = t(x, 7, 7, mask)
    bp = BlockParams(n_heads=2, window_size=3, w=7, h=7, shift=shift)
    actual = swin_block(make_params(t), x.numpy(), compute_attention_mask(7, 7, 3), bp)
    tensors_match(expected, actual, label=f"swin_block{shift}", atol=1e-3)


def test_swin_patch_merging():
    t = randomize(TPatchMergingSwin(8))
    x = input_tensor(1, 24, 8)  # 6x4
    expected = t(x, 4, 6)
    actual = patch_merging(make_params(t), x.numpy(), 6, 4)
    tensors_match(expected, actual, label="swin_merge", atol=1e-4)


def test_swin_encode_full():
    t = randomize(TSwin())
    x = input_tensor(1, 3, 64, 64)
    with torch.no_grad():
        expected = t(x)
    outs = swin_encode(make_params(t), to_nhwc(x), SWIN_TEST)
    for i, (e, a) in enumerate(zip(expected, outs)):
        tensors_match(e, a, label=f"swin_out{i}", atol=2e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# BiRefNet decoder torch replica
# ---------------------------------------------------------------------------


class TScaleShift(nn.Module):
    """BN fused to mul/add at conversion (fuse_batch_norm, convert.py:133-154)."""

    def __init__(self, ch):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(ch) * 0.1 + 1.0)
        self.bias = nn.Parameter(torch.randn(ch) * 0.1)

    def forward(self, x):
        return x * self.weight.view(1, -1, 1, 1) + self.bias.view(1, -1, 1, 1)


class TDeformConv(nn.Module):
    def __init__(self, ci, co, k, pad):
        super().__init__()
        self.offset = nn.Conv2d(ci, 2 * k * k, k, padding=pad)
        self.modulator = nn.Conv2d(ci, k * k, k, padding=pad)
        conv = nn.Module()
        conv.weight = nn.Parameter(torch.randn(co, ci, k, k) * 0.1)
        self.conv = conv
        self.k, self.pad = k, pad

    def forward(self, x):
        off = self.offset(x)
        mod = 2.0 * torch.sigmoid(self.modulator(x))
        return t_deform_conv2d(x, self.conv.weight, off, mod, 1, self.pad)


class TASPPModule(nn.Module):
    def __init__(self, ci, co, k, pad):
        super().__init__()
        self.conv = TDeformConv(ci, co, k, pad)
        self.bn = TScaleShift(co)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TASPP(nn.Module):
    def __init__(self, ci, inter, co):
        super().__init__()
        self.aspp1 = TASPPModule(ci, inter, 1, 0)
        self.aspp_deforms = nn.ModuleList([
            TASPPModule(ci, inter, 1, 0), TASPPModule(ci, inter, 3, 1), TASPPModule(ci, inter, 7, 3),
        ])
        self.global_avg_pool = nn.ModuleList([nn.Identity(), nn.Conv2d(ci, inter, 1)])
        self.conv1 = nn.Conv2d(inter * 5, co, 1)

    def forward(self, x):
        x1 = self.aspp1(x)
        ds = [m(x) for m in self.aspp_deforms]
        g = F.relu(self.global_avg_pool[1](x.mean((2, 3), keepdim=True)))
        g = F.interpolate(g, size=x1.shape[2:], mode="bilinear", align_corners=True)
        out = torch.cat([x1, *ds, g], 1)
        return F.relu(self.conv1(out))


class TBasicDecBlk(nn.Module):
    def __init__(self, ci, co, inter=8):
        super().__init__()
        self.conv_in = nn.Conv2d(ci, inter, 3, padding=1)
        self.dec_att = TASPP(inter, inter, inter)
        self.conv_out = nn.Conv2d(inter, co, 3, padding=1)

    def forward(self, x):
        x = F.relu(self.conv_in(x))
        x = self.dec_att(x)
        return self.conv_out(x)


class TSimpleConvs(nn.Module):
    def __init__(self, ci, co, inter=8):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, inter, 3, padding=1)
        self.conv_out = nn.Conv2d(inter, co, 3, padding=1)

    def forward(self, x):
        return self.conv_out(self.conv1(x))


def t_image2patches(x, out_h, out_w):
    b, c, h, w = x.shape
    gh, gw = h // out_h, w // out_w
    x = x.view(b, c, gh, out_h, gw, out_w)
    x = x.permute(0, 1, 2, 4, 3, 5).reshape(b, c * gh * gw, out_h, out_w)
    return x


def test_image_to_patches():
    x = torch.arange(3 * 8 * 8).reshape(1, 3, 8, 8).float()
    expected = t_image2patches(x, 4, 4)
    actual = image_to_patches(to_nhwc(x), 4, 4)
    tensors_match(torch.from_numpy(to_nhwc(expected)), actual, label="i2p", atol=1e-6)


def test_aspp_and_basic_block():
    t = randomize(TBasicDecBlk(6, 10))
    x = input_tensor(1, 6, 8, 8)
    with torch.no_grad():
        expected = to_nhwc(t(x))
    actual = basic_decoder_block(make_params(t), to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="dec_blk", atol=1e-3)


class TBirefnet(nn.Module):
    """Tiny full BiRefNet: TSwin encoder (dual scale) + decoder."""

    def __init__(self):
        super().__init__()
        self.bb = TSwin()
        dims = self.bb.dims  # (8,16,32,64)
        cat = [2 * d for d in dims]
        cat3 = sum(cat)  # pyramid concat into level 3
        ch = 12
        sq = nn.Module()
        # squeeze_module.0
        self.squeeze_module = nn.ModuleList([TBasicDecBlk(cat3, ch)])
        dec = nn.Module()
        ipt_out = 4
        dec.ipt_blk5 = TSimpleConvs(3 * 32 * 32, ipt_out)  # image 64 -> feat 2: grid 32
        dec.ipt_blk4 = TSimpleConvs(3 * 16 * 16, ipt_out)
        dec.ipt_blk3 = TSimpleConvs(3 * 8 * 8, ipt_out)
        dec.ipt_blk2 = TSimpleConvs(3 * 4 * 4, ipt_out)
        dec.ipt_blk1 = TSimpleConvs(3, ipt_out)
        dec.block4 = TBasicDecBlk(ch + ipt_out, ch)
        dec.block3 = TBasicDecBlk(ch + ipt_out, ch)
        dec.block2 = TBasicDecBlk(ch + ipt_out, ch)
        dec.block1 = TBasicDecBlk(ch + ipt_out, ch)
        for i in (2, 3, 4):
            setattr(dec, f"gdt_convs_{i}", nn.ModuleList([nn.Conv2d(ch, 6, 3, padding=1)]))
            setattr(dec, f"gdt_convs_attn_{i}", nn.ModuleList([nn.Conv2d(6, 1, 1)]))
        lb4, lb3, lb2 = nn.Module(), nn.Module(), nn.Module()
        lb4.conv = nn.Conv2d(cat[2], ch, 1)
        lb3.conv = nn.Conv2d(cat[1], ch, 1)
        lb2.conv = nn.Conv2d(cat[0], ch, 1)
        dec.lateral_block4, dec.lateral_block3, dec.lateral_block2 = lb4, lb3, lb2
        dec.conv_out1 = nn.ModuleList([nn.Conv2d(ch + ipt_out, 1, 1)])
        self.decoder = dec

    def forward(self, x):
        xs = self.bb(x)  # NHWC outputs
        xs = [o.permute(0, 3, 1, 2) for o in xs]
        x_low = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=True)
        xs_low = [o.permute(0, 3, 1, 2) for o in self.bb(x_low)]
        for i in range(4):
            up = F.interpolate(xs_low[i], size=xs[i].shape[2:], mode="bilinear", align_corners=True)
            xs[i] = torch.cat([xs[i], up], 1)
        ds = lambda t, f: F.interpolate(t, size=(t.shape[2] // f, t.shape[3] // f), mode="bilinear", align_corners=True)
        xs[3] = torch.cat([ds(xs[0], 8), ds(xs[1], 4), ds(xs[2], 2), xs[3]], 1)
        x4 = self.squeeze_module[0](xs[3])

        d = self.decoder

        def inject(feat, blk):
            patches = t_image2patches(x, feat.shape[2], feat.shape[3])
            return torch.cat([feat, blk(patches)], 1)

        up_to = lambda t, ref: F.interpolate(t, size=ref.shape[2:], mode="bilinear", align_corners=True)
        x4 = inject(x4, d.ipt_blk5)
        p4 = d.block4(x4)
        p4 = p4 * torch.sigmoid(d.gdt_convs_attn_4[0](F.relu(d.gdt_convs_4[0](p4))))
        x3l = d.lateral_block4.conv(xs[2])
        _p3 = up_to(p4, x3l) + x3l
        _p3 = inject(_p3, d.ipt_blk4)
        p3 = d.block3(_p3)
        p3 = p3 * torch.sigmoid(d.gdt_convs_attn_3[0](F.relu(d.gdt_convs_3[0](p3))))
        x2l = d.lateral_block3.conv(xs[1])
        _p2 = up_to(p3, x2l) + x2l
        _p2 = inject(_p2, d.ipt_blk3)
        p2 = d.block2(_p2)
        p2 = p2 * torch.sigmoid(d.gdt_convs_attn_2[0](F.relu(d.gdt_convs_2[0](p2))))
        x1l = d.lateral_block2.conv(xs[0])
        _p1 = up_to(p2, x1l) + x1l
        _p1 = inject(_p1, d.ipt_blk2)
        _p1 = d.block1(_p1)
        _p1 = up_to(_p1, x)
        _p1 = torch.cat([_p1, d.ipt_blk1(x)], 1)
        return torch.sigmoid(d.conv_out1[0](_p1))


def test_birefnet_predict_full():
    t = randomize(TBirefnet())
    x = input_tensor(1, 3, 64, 64)
    with torch.no_grad():
        expected = to_nhwc(t(x))
    p = BirefnetParams(image_size=64, image_extent=(64, 64), encoder=SWIN_TEST)
    actual = birefnet_predict(make_params(t), to_nhwc(x), p)
    tensors_match(torch.from_numpy(expected), actual, label="birefnet", atol=5e-3, rtol=1e-2)


def test_birefnet_image_extent():
    p = BirefnetParams(image_size=1024, image_multiple=128)
    assert birefnet_image_extent((500, 700), p, 1 << 40) == (1024, 1024)
    pd = BirefnetParams(image_size=-1, image_multiple=128)
    assert birefnet_image_extent((500, 700), pd, 1 << 40) == (512, 768)
    # clamped when exceeding max_alloc
    w, h = birefnet_image_extent((4096, 4096), pd, 2 << 30)
    assert w < 4096 and w % 128 == 0 and h % 128 == 0


def test_birefnet_batch_extent_recaps_combined_area():
    """A wide image and a tall image each pass the per-image area cap, but
    their elementwise-max bucket would not — the batch extent must re-apply
    the max_alloc cap to the combined extent."""
    from vision_tpu.models.birefnet import birefnet_batch_extent

    pd = BirefnetParams(image_size=-1, image_multiple=128)
    max_alloc = 2 << 30
    budget_px = max_alloc / (240 * 4)
    wide = birefnet_image_extent((4096, 1024), pd, max_alloc)
    tall = birefnet_image_extent((1024, 4096), pd, max_alloc)
    assert wide[0] * wide[1] <= budget_px and tall[0] * tall[1] <= budget_px
    naive = (max(wide[0], tall[0]), max(wide[1], tall[1]))
    assert naive[0] * naive[1] > budget_px  # the bug being guarded against
    w, h = birefnet_batch_extent([(4096, 1024), (1024, 4096)], pd, max_alloc)
    assert w % 128 == 0 and h % 128 == 0
    assert w * h <= budget_px
    # fixed-extent models are unaffected
    pf = BirefnetParams(image_size=1024, image_multiple=128)
    assert birefnet_batch_extent([(4096, 1024), (300, 200)], pf, max_alloc) == (1024, 1024)


@pytest.mark.parametrize("k,stride,pad", [(1, 1, 0), (3, 1, 1), (7, 1, 3), (3, 2, 1)])
def test_deform_conv_shift_matches_gather(k, stride, pad):
    """The gather-free shift formulation is exact while |offset| <= bound."""
    from vision_tpu.ops.deform import deform_conv_2d_shift

    g = torch.Generator().manual_seed(21)
    x = torch.randn(2, 5, 10, 12, generator=g)
    weight = torch.randn(7, 5, k, k, generator=g) * 0.2
    ho = (10 + 2 * pad - k) // stride + 1
    wo = (12 + 2 * pad - k) // stride + 1
    offset = (torch.rand(2, 2 * k * k, ho, wo, generator=g) - 0.5) * 7.0  # within +-3.5
    mask = torch.rand(2, k * k, ho, wo, generator=g) * 2.0
    expected = t_deform_conv2d(x, weight, offset, mask, stride, pad)
    actual = deform_conv_2d_shift(
        to_nhwc(x), weight.numpy(), to_nhwc(offset), to_nhwc(mask), stride, pad, bound=4
    )
    tensors_match(torch.from_numpy(to_nhwc(expected)), actual, label=f"deform_shift{k}", atol=1e-3)


def test_deform_conv_shift_clamps_large_offsets():
    """Offsets beyond the bound saturate (documented divergence)."""
    from vision_tpu.ops.deform import deform_conv_2d_shift

    g = torch.Generator().manual_seed(22)
    x = torch.randn(1, 4, 8, 8, generator=g)
    weight = torch.randn(6, 4, 3, 3, generator=g)
    offset = torch.full((1, 18, 8, 8), 9.0)
    expected = t_deform_conv2d(x, weight, offset.clamp(-2, 2), None, 1, 1)
    actual = deform_conv_2d_shift(to_nhwc(x), weight.numpy(), to_nhwc(offset), None, 1, 1, bound=2)
    tensors_match(torch.from_numpy(to_nhwc(expected)), actual, label="deform_clamp", atol=1e-3)
