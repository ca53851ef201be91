"""Depth-Anything V2 / DINOv2 parity tests (reference tests pattern: torch
replicas of the HF transformers modules vs the framework implementation)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.models.depth_anything import (
    DepthAnythingParams,
    depthany_image_extent,
    depthany_predict,
    feature_fusion,
    head,
    neck,
    residual_conv,
)
from vision_tpu.models.dino import (
    DinoParams,
    dino_get_intermediate_layers,
    layer as dino_layer,
    prepare_tokens,
)

from workbench import input_tensor, make_params, randomize, tensors_match, to_nhwc


class TDinoEmbeddings(nn.Module):
    def __init__(self, dim=32, patch=14, grid=4):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.position_embeddings = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        pe = nn.Module()
        pe.projection = nn.Conv2d(3, dim, patch, stride=patch)
        self.patch_embeddings = pe
        self.patch, self.grid, self.dim = patch, grid, dim

    def forward(self, x):
        b, _, h, w = x.shape
        emb = self.patch_embeddings.projection(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, emb], dim=1)
        n = self.grid * self.grid
        n_patch = tokens.shape[1] - 1
        pos = self.position_embeddings
        if n_patch != n or w != h:
            cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
            g = int(math.sqrt(n) + 0.01)
            grid = patch_pos.reshape(1, g, g, self.dim).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, size=(h // self.patch, w // self.patch), mode="bicubic", align_corners=False)
            grid = grid.permute(0, 2, 3, 1).reshape(1, -1, self.dim)
            pos = torch.cat([cls_pos, grid], dim=1)
        return tokens + pos


class TDinoLayer(nn.Module):
    def __init__(self, dim=32, heads=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        attn = nn.Module()
        inner = nn.Module()
        inner.query = nn.Linear(dim, dim)
        inner.key = nn.Linear(dim, dim)
        inner.value = nn.Linear(dim, dim)
        attn.attention = inner
        out = nn.Module()
        out.dense = nn.Linear(dim, dim)
        attn.output = out
        self.attention = attn
        ls1, ls2 = nn.Module(), nn.Module()
        ls1.lambda1 = nn.Parameter(torch.randn(dim) * 0.1)
        ls2.lambda1 = nn.Parameter(torch.randn(dim) * 0.1)
        self.layer_scale1, self.layer_scale2 = ls1, ls2
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * 4)
        mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlp
        self.heads = heads

    def forward(self, x):
        b, t, c = x.shape
        hd = c // self.heads
        h = self.norm1(x)
        a = self.attention.attention
        q, k, v = a.query(h), a.key(h), a.value(h)
        q, k, v = (z.reshape(b, t, self.heads, hd).permute(0, 2, 1, 3) for z in (q, k, v))
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
        attn = attn.softmax(-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, t, c)
        o = self.attention.output.dense(o)
        x = x + o * self.layer_scale1.lambda1
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h), approximate="tanh"))
        return x + h * self.layer_scale2.lambda1


class TDino(nn.Module):
    def __init__(self, dim=32, heads=4, layers=3, patch=14, grid=4):
        super().__init__()
        self.embeddings = TDinoEmbeddings(dim, patch, grid)
        enc = nn.Module()
        enc.layer = nn.ModuleList([TDinoLayer(dim, heads) for _ in range(layers)])
        self.encoder = enc
        self.layernorm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, take):
        t = self.embeddings(x)
        outs = []
        for i, blk in enumerate(self.encoder.layer):
            t = blk(t)
            if i in take:
                outs.append(self.layernorm(t))
        return outs


def test_prepare_tokens_native_grid():
    t = randomize(TDinoEmbeddings(dim=32, patch=14, grid=4))
    x = input_tensor(2, 3, 56, 56)  # 4x4 grid == stored pos embed
    expected = t(x)
    actual = prepare_tokens(make_params(t), to_nhwc(x), 14)
    tensors_match(expected, actual, label="tokens", atol=1e-4)


def test_prepare_tokens_interpolated():
    t = randomize(TDinoEmbeddings(dim=32, patch=14, grid=4))
    x = input_tensor(1, 3, 84, 70)  # 6x5 grid -> bicubic interp
    expected = t(x)
    actual = prepare_tokens(make_params(t), to_nhwc(x), 14)
    tensors_match(expected, actual, label="tokens_interp", atol=1e-4)


def test_dino_layer():
    t = randomize(TDinoLayer(dim=32, heads=4))
    x = input_tensor(2, 17, 32)
    expected = t(x)
    actual = dino_layer(make_params(t), x.numpy(), DinoParams(n_heads=4))
    tensors_match(expected, actual, label="dino_layer", atol=1e-4)


def test_dino_intermediate_layers():
    t = randomize(TDino(dim=32, heads=4, layers=3, patch=14, grid=4))
    x = input_tensor(1, 3, 56, 56)
    expected = t(x, take={0, 2})
    p = make_params(t)
    actual = dino_get_intermediate_layers(
        p, to_nhwc(x), [0, 2], DinoParams(patch_size=14, embed_dim=32, n_heads=4, n_layers=3)
    )
    assert len(actual) == 2
    for e, a in zip(expected, actual):
        tensors_match(e, a, label="dino_interm", atol=1e-4)


# -- DPT neck/head --


class TResidual(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.convolution1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.convolution2 = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        out = self.convolution2(F.relu(self.convolution1(F.relu(x))))
        return x + out


class TFusion(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.residual_layer1 = TResidual(ch)
        self.residual_layer2 = TResidual(ch)
        self.projection = nn.Conv2d(ch, ch, 1)

    def forward(self, x0, x1=None, size=None):
        x = x0
        if x1 is not None:
            x = x + self.residual_layer1(x1)
        x = self.residual_layer2(x)
        if size is None:
            size = (x.shape[2] * 2, x.shape[3] * 2)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        return self.projection(x)


class TNeck(nn.Module):
    def __init__(self, dim=32, ch=16, feat_ch=(8, 12, 16, 24)):
        super().__init__()
        rs = nn.Module()
        layers = []
        for i, fc in enumerate(feat_ch):
            lay = nn.Module()
            lay.projection = nn.Conv2d(dim, fc, 1)
            if i == 0:
                lay.resize = nn.ConvTranspose2d(fc, fc, 4, stride=4)
            elif i == 1:
                lay.resize = nn.ConvTranspose2d(fc, fc, 2, stride=2)
            elif i == 3:
                lay.resize = nn.Conv2d(fc, fc, 3, stride=2, padding=1)
            layers.append(lay)
        rs.layers = nn.ModuleList(layers)
        self.reassemble_stage = rs
        self.convs = nn.ModuleList([nn.Conv2d(fc, ch, 3, padding=1, bias=False) for fc in feat_ch])
        fs = nn.Module()
        fs.layers = nn.ModuleList([TFusion(ch) for _ in range(4)])
        self.fusion_stage = fs

    def forward(self, feats, pw, ph):
        layers = []
        for i, f in enumerate(feats):
            x = f[:, 1:]
            b, t, c = x.shape
            x = x.transpose(1, 2).reshape(b, c, ph, pw)
            lay = self.reassemble_stage.layers[i]
            x = lay.projection(x)
            if i in (0, 1, 3):
                x = lay.resize(x)
            layers.append(x)
        layers = [self.convs[i](layers[i]) for i in range(4)]
        f = self.fusion_stage.layers
        fused = f[0](layers[3], None, layers[2].shape[2:])
        fused = f[1](fused, layers[2], layers[1].shape[2:])
        fused = f[2](fused, layers[1], layers[0].shape[2:])
        fused = f[3](fused, layers[0])
        return fused


class THead(nn.Module):
    def __init__(self, ch=16):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch // 2, 3, padding=1)
        self.conv2 = nn.Conv2d(ch // 2, 8, 3, padding=1)
        self.conv3 = nn.Conv2d(8, 1, 1)

    def forward(self, x, size):
        x = self.conv1(x)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        x = F.relu(self.conv2(x))
        return F.relu(self.conv3(x))


def test_residual_and_fusion():
    t = randomize(TFusion(16))
    x0 = input_tensor(1, 16, 8, 8)
    x1 = input_tensor(1, 16, 8, 8, seed=23)
    expected = to_nhwc(t(x0, x1, (12, 10)))
    p = make_params(t)
    actual = feature_fusion(p, to_nhwc(x0), to_nhwc(x1), (12, 10))
    tensors_match(torch.from_numpy(expected), actual, label="fusion", atol=1e-4)


def test_neck_and_head():
    tn = randomize(TNeck())
    th = randomize(THead())
    pw = ph = 4
    feats = [input_tensor(1, pw * ph + 1, 32, seed=s) for s in (1, 2, 3, 4)]
    with torch.no_grad():
        fused = tn(feats, pw, ph)
        expected = to_nhwc(th(fused, (56, 56)))
    pn, phd = make_params(tn), make_params(th)
    fused_j = neck(pn, [f.numpy() for f in feats], pw, ph)
    tensors_match(torch.from_numpy(to_nhwc(fused)), fused_j, label="neck", atol=1e-4)
    out = head(phd, fused_j, 56, 56, 1.0)
    tensors_match(torch.from_numpy(expected), out, label="head", atol=1e-4)


class TDepthAnything(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TDino(dim=32, heads=4, layers=4, patch=14, grid=4)
        self.neck = TNeck(dim=32, ch=16)
        self.head = THead(16)

    def forward(self, x):
        b, _, h, w = x.shape
        feats = self.backbone(x, take={0, 1, 2, 3})
        fused = self.neck(feats, w // 14, h // 14)
        return self.head(fused, (h, w))


def test_depthany_predict_full():
    t = randomize(TDepthAnything())
    x = input_tensor(1, 3, 56, 70)
    with torch.no_grad():
        expected = to_nhwc(t(x))
    p = DepthAnythingParams(
        dino=DinoParams(patch_size=14, embed_dim=32, n_heads=4, n_layers=4),
        feature_layers=(0, 1, 2, 3),
    )
    actual = depthany_predict(make_params(t), to_nhwc(x), p)
    tensors_match(torch.from_numpy(expected), actual, label="depthany", atol=1e-4, rtol=1e-3)


def test_depthany_image_extent():
    p = DepthAnythingParams()
    # 518x714-ish behavior: short side snapped to >= 518, multiple of 14
    assert depthany_image_extent((700, 500), p) == (728, 518)
    w, h = depthany_image_extent((1024, 768), p)
    assert w % 14 == 0 and h % 14 == 0 and min(w, h) >= 518
    assert depthany_image_extent((518, 518), p) == (518, 518)
