"""MI-GAN parity tests (reference tests/test_migan.py pattern). The torch
modules re-create the original MI-GAN generator structure with the exact
state-dict names the reference converter passes through (convert.py:482-497)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.models.migan import (
    MiganParams,
    downsample_2d,
    encode,
    lrelu_agc,
    migan_generate,
    migan_process_input,
    separable_conv_2d,
    synthesis,
    upsample_2d,
)

from workbench import input_tensor, make_params, randomize, tensors_match, to_nhwc

SQRT2 = 1.4142135623


def t_lrelu_agc(x, alpha=0.2, gain=1.0, clamp=0.0):
    x = F.leaky_relu(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp != 0.0:
        x = torch.clamp(x, -clamp, clamp)
    return x


class TDown(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.filter = nn.Conv2d(ch, ch, 3, stride=2, padding=1, groups=ch, bias=False)


class TUp(nn.Module):
    def __init__(self, ch, res):
        super().__init__()
        self.filter = nn.Conv2d(ch, ch, 4, padding=2, groups=ch, bias=False)
        self.register_buffer("filter_const", torch.randn(res * 2, res * 2) * 0.1 + 1.0)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = x * self.filter_const
        x = self.filter(x)
        return x[:, :, :-1, :-1]


class TSeparable(nn.Module):
    def __init__(self, ci, co, k, res, activation=False, down=False, up=False, noise=False):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, ci, k, padding=k // 2, groups=ci, bias=False)
        self.conv2 = nn.Conv2d(ci, co, 1)
        self.flags = (activation, down, up, noise)
        if down:
            self.downsample = TDown(ci)
        if up:
            self.upsample = TUp(co, res)
        if noise:
            out_res = res * 2 if up else res
            self.register_buffer("noise_const", torch.randn(out_res, out_res) * 0.1)
            self.noise_strength = nn.Parameter(torch.tensor(0.3))

    def forward(self, x):
        activation, down, up, noise = self.flags
        x = self.conv1(x)
        if activation:
            x = t_lrelu_agc(x, 0.2, SQRT2, 256)
        if down:
            x = self.downsample.filter(x)
        x = self.conv2(x)
        if up:
            x = self.upsample(x)
        if noise:
            x = x + self.noise_const * self.noise_strength
        if activation:
            x = t_lrelu_agc(x, 0.2, SQRT2, 256)
        return x


def test_lrelu_agc():
    x = input_tensor(1, 4, 8, 8) * 300
    expected = t_lrelu_agc(x, 0.2, SQRT2, 256)
    actual = lrelu_agc(x.numpy(), 0.2, SQRT2, 256)
    tensors_match(expected, actual, label="lrelu_agc")


def test_separable_conv_plain():
    t = randomize(TSeparable(8, 12, 3, 16, activation=True))
    x = input_tensor(1, 8, 16, 16)
    expected = to_nhwc(t(x))
    actual = separable_conv_2d(make_params(t), to_nhwc(x), activation=True)
    tensors_match(torch.from_numpy(expected), actual, label="sep", atol=1e-4)


def test_separable_conv_down():
    t = randomize(TSeparable(8, 12, 3, 16, activation=True, down=True))
    x = input_tensor(1, 8, 16, 16)
    expected = to_nhwc(t(x))
    actual = separable_conv_2d(make_params(t), to_nhwc(x), activation=True, downsample=True)
    tensors_match(torch.from_numpy(expected), actual, label="sep_down", atol=1e-4)


def test_separable_conv_up_noise():
    t = randomize(TSeparable(8, 12, 3, 8, activation=True, up=True, noise=True))
    x = input_tensor(1, 8, 8, 8)
    expected = to_nhwc(t(x))
    actual = separable_conv_2d(
        make_params(t), to_nhwc(x), activation=True, upsample=True, noise=True
    )
    tensors_match(torch.from_numpy(expected), actual, label="sep_up", atol=1e-4)


class TEncoderBlock(nn.Module):
    def __init__(self, ci, co, res, down=True):
        super().__init__()
        self.conv1 = TSeparable(ci, ci, 3, res, activation=True)
        self.conv2 = TSeparable(ci, co, 3, res, activation=True, down=down)

    def forward(self, x):
        feat = self.conv1(x)
        return self.conv2(feat), feat


class TSynthesisBlock(nn.Module):
    def __init__(self, ci, co, res, up, noise):
        super().__init__()
        # conv1 upsamples res//2 -> res when up
        self.conv1 = TSeparable(ci, co, 3, res // 2 if up else res, activation=True, up=up, noise=noise)
        self.conv2 = TSeparable(co, co, 3, res, activation=True, noise=noise)
        self.torgb = nn.Conv2d(co, 3, 1)
        if up:
            self.upsample = TUp(3, res // 2)
        self.up = up

    def forward(self, x, feat, img):
        x = self.conv1(x)
        x = x + feat
        x = self.conv2(x)
        if img is not None:
            img = self.upsample(img)
        y = self.torgb(x)
        img = y if img is None else img + y
        return x, img


class TMigan(nn.Module):
    """Tiny MI-GAN: resolution 16 -> ladder b16, b8, b4."""

    def __init__(self, res=16, ch=8):
        super().__init__()
        enc = nn.Module()
        b16 = nn.Module()
        b16.fromrgb = nn.Conv2d(4, ch, 1)
        b16.conv1 = TSeparable(ch, ch, 3, 16, activation=True)
        b16.conv2 = TSeparable(ch, ch, 3, 16, activation=True, down=True)
        b8 = nn.Module()
        b8.conv1 = TSeparable(ch, ch, 3, 8, activation=True)
        b8.conv2 = TSeparable(ch, ch, 3, 8, activation=True, down=True)
        b4 = nn.Module()
        b4.conv1 = TSeparable(ch, ch, 3, 4, activation=True)
        b4.conv2 = TSeparable(ch, ch, 3, 4, activation=True)
        enc.b16, enc.b8, enc.b4 = b16, b8, b4
        self.encoder = enc

        syn = nn.Module()
        syn.b4 = TSynthesisBlock(ch, ch, 4, up=False, noise=False)
        syn.b8 = TSynthesisBlock(ch, ch, 8, up=True, noise=True)
        syn.b16 = TSynthesisBlock(ch, ch, 16, up=True, noise=True)
        self.synthesis = syn
        self.res = res

    def forward(self, x):
        e = self.encoder
        x = t_lrelu_agc(e.b16.fromrgb(x), 0.2, SQRT2, 256)
        feats = []
        for blk in (e.b16, e.b8):
            feat = blk.conv1(x)
            x = blk.conv2(feat)
            feats.append(feat)
        feat = e.b4.conv1(x)
        x = e.b4.conv2(feat)
        feats.append(feat)

        s = self.synthesis
        x, img = s.b4(x, feats[2], None)
        x, img = s.b8(x, feats[1], img)
        x, img = s.b16(x, feats[0], img)
        return img


def test_migan_encode():
    t = randomize(TMigan())
    x = input_tensor(1, 4, 16, 16)
    with torch.no_grad():
        e = t.encoder
        h = t_lrelu_agc(e.b16.fromrgb(x), 0.2, SQRT2, 256)
        feats_t = []
        for blk in (e.b16, e.b8):
            f = blk.conv1(h)
            h = blk.conv2(f)
            feats_t.append(f)
        f = e.b4.conv1(h)
        h = e.b4.conv2(f)
        feats_t.append(f)
    p = make_params(t)
    out, feats = encode(p["encoder"], to_nhwc(x), 16)
    tensors_match(torch.from_numpy(to_nhwc(h)), out, label="encode_out", atol=1e-4)
    for i, (ft, fj) in enumerate(zip(feats_t, feats)):
        tensors_match(torch.from_numpy(to_nhwc(ft)), fj, label=f"feat{i}", atol=1e-4)


def test_migan_generate_full():
    t = randomize(TMigan())
    x = input_tensor(1, 4, 16, 16)
    with torch.no_grad():
        expected = to_nhwc(t(x))
    actual = migan_generate(make_params(t), to_nhwc(x), MiganParams(resolution=16))
    tensors_match(torch.from_numpy(expected), actual, label="migan", atol=1e-4)


def test_migan_process_input():
    from vision_tpu.image import image_load_array

    rng = np.random.default_rng(0)
    img = image_load_array(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    mask = image_load_array(np.full((16, 16, 1), 255, np.uint8))
    x = migan_process_input(img, mask, MiganParams(resolution=16, invert_mask=True))
    assert x.shape == (16, 16, 4)
    # mask 255 + invert -> alpha 0 -> [-0.5, 0, 0, 0]
    np.testing.assert_allclose(x[:, :, 0], -0.5, atol=1e-6)
    np.testing.assert_allclose(x[:, :, 1:], 0.0, atol=1e-6)
    x2 = migan_process_input(img, mask, MiganParams(resolution=16, invert_mask=False))
    np.testing.assert_allclose(x2[:, :, 0], 0.5, atol=1e-6)
    exp = (img.data.astype(np.float32) / 255.0) * 2 - 1
    np.testing.assert_allclose(x2[:, :, 1:], exp, atol=1e-5)
