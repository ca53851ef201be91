"""Real-ESRGAN parity tests (reference tests/test_esrgan.py pattern: torch
RRDBNet replica with deterministic weights vs the framework implementation)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.gguf import GGUFWriter
from vision_tpu.core.params import Params
from vision_tpu.image import Image, ImageFormat, image_difference_rms, image_load_array
from vision_tpu.models.esrgan import (
    EsrganParams,
    esrgan_detect_params,
    esrgan_generate,
    esrgan_load_model,
    residual_dense_block,
    rrdb,
)

from workbench import input_tensor, make_params, randomize, tensors_match, to_nhwc


class ResidualDenseBlock(nn.Module):
    """RRDBNet dense block (public ESRGAN 'old arch' layout — names must
    match the GGUF files the reference converter emits)."""

    def __init__(self, nf, gc):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(nf, gc, 3, 1, 1))
        self.conv2 = nn.Sequential(nn.Conv2d(nf + gc, gc, 3, 1, 1))
        self.conv3 = nn.Sequential(nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1))
        self.conv4 = nn.Sequential(nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1))
        self.conv5 = nn.Sequential(nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1))

    def forward(self, x):
        act = lambda t: F.leaky_relu(t, 0.2)
        x1 = act(self.conv1(x))
        x2 = act(self.conv2(torch.cat([x, x1], 1)))
        x3 = act(self.conv3(torch.cat([x, x1, x2], 1)))
        x4 = act(self.conv4(torch.cat([x, x1, x2, x3], 1)))
        x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.RDB1 = ResidualDenseBlock(nf, gc)
        self.RDB2 = ResidualDenseBlock(nf, gc)
        self.RDB3 = ResidualDenseBlock(nf, gc)

    def forward(self, x):
        return x + 0.2 * self.RDB3(self.RDB2(self.RDB1(x)))


class RRDBNet(nn.Module):
    """Old-arch sequential RRDBNet: model.0 .. model.10 naming."""

    def __init__(self, nf=16, nb=2, gc=8, scale=4):
        super().__init__()
        sub = nn.Sequential(*[RRDB(nf, gc) for _ in range(nb)], nn.Conv2d(nf, nf, 3, 1, 1))
        shortcut = nn.Module()
        shortcut.sub = sub
        layers = [
            nn.Conv2d(3, nf, 3, 1, 1),  # 0
            shortcut,  # 1
            nn.Upsample(scale_factor=2, mode="nearest"),  # 2
            nn.Conv2d(nf, nf, 3, 1, 1),  # 3
            nn.LeakyReLU(0.2),  # 4
            nn.Upsample(scale_factor=2, mode="nearest"),  # 5
            nn.Conv2d(nf, nf, 3, 1, 1),  # 6
            nn.LeakyReLU(0.2),  # 7
            nn.Conv2d(nf, nf, 3, 1, 1),  # 8
            nn.LeakyReLU(0.2),  # 9
            nn.Conv2d(nf, 3, 3, 1, 1),  # 10
        ]
        self.model = nn.ModuleList(layers)
        self.nb = nb

    def forward(self, x):
        m = self.model
        fea = m[0](x)
        sub = fea
        for blk in m[1].sub:
            sub = blk(sub)
        fea = fea + sub
        fea = m[4](m[3](m[2](fea)))
        fea = m[7](m[6](m[5](fea)))
        return m[10](m[9](m[8](fea)))


def test_residual_dense_block():
    t = randomize(ResidualDenseBlock(16, 8))
    x = input_tensor(1, 16, 12, 12)
    expected = to_nhwc(t(x))
    actual = residual_dense_block(make_params(t), to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="rdb", atol=1e-4)


def test_rrdb():
    t = randomize(RRDB(16, 8))
    x = input_tensor(1, 16, 10, 10)
    expected = to_nhwc(t(x))
    actual = rrdb(make_params(t), to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="rrdb", atol=1e-4)


def test_esrgan_generate_full():
    t = randomize(RRDBNet(nf=16, nb=2, gc=8, scale=4))
    x = input_tensor(1, 3, 16, 16)
    expected = to_nhwc(t(x))
    actual = esrgan_generate(make_params(t), to_nhwc(x), EsrganParams(scale=4, n_blocks=2))
    tensors_match(torch.from_numpy(expected), actual, label="esrgan", atol=1e-4, rtol=1e-3)


def _write_gguf(path, torch_model, scale, nb):
    w = GGUFWriter(path, "esrgan")
    w.add("esrgan.scale", scale)
    w.add("esrgan.block_count", nb)
    w.add("esrgan.tensor_data_layout", "whcn")
    for k, v in torch_model.state_dict().items():
        w.add_tensor(k, v.numpy())
    w.write()
    return path


def test_esrgan_end_to_end_gguf(tmp_path):
    """Full pipeline: GGUF -> load -> tiled compute -> u8 image, compared
    against torch on the same padded tiles (reference test-models.cpp tier)."""
    from vision_tpu.core.device import BackendType, backend_init

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    path = _write_gguf(tmp_path / "esrgan.gguf", t, 4, 1)
    model = esrgan_load_model(str(path), backend_init(BackendType.cpu))
    assert model.p == EsrganParams(scale=4, n_blocks=1)

    rng = np.random.default_rng(5)
    img_u8 = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    out = model.compute(image_load_array(img_u8), tile_size=32, batch=2)
    assert out.format == ImageFormat.rgba_u8
    assert out.extent == (56 * 4, 40 * 4)

    # torch reference: identical tile extraction/merge math
    from vision_tpu.image import TileLayout, tile_scale, tile_weights

    tiles = TileLayout((56, 40), 32, 16)
    tiles_out = tile_scale(tiles, 4)
    tw, th = tiles.tile_size
    src = img_u8.astype(np.float32) / 255.0
    acc = np.zeros((160, 224, 3), np.float32)
    with torch.no_grad():
        for i in range(tiles.total()):
            c = tiles.coord(i)
            sx, sy = tiles.start(c)
            ys = np.minimum(np.arange(sy, sy + th), 39)
            xs = np.minimum(np.arange(sx, sx + tw), 55)
            tile = src[np.ix_(ys, xs)]
            y = t(torch.from_numpy(tile).permute(2, 0, 1)[None])[0].permute(1, 2, 0).numpy()
            beg, end = tiles_out.start(c), tiles_out.end(c)
            blend = tile_weights(tiles_out, c)[:, :, None]
            acc[beg[1]:end[1], beg[0]:end[0]] += blend * y[: end[1] - beg[1], : end[0] - beg[0]]
    expected_u8 = np.clip(acc, 0, 1) * 255.0
    ours = out.data[:, :, :3].astype(np.float32)
    rms = np.sqrt((((expected_u8 - ours) / 255.0) ** 2).mean())
    assert rms < 0.01, f"tiled pipeline rms {rms}"


def test_esrgan_detect_params_validation(tmp_path):
    w = GGUFWriter(tmp_path / "bad.gguf", "esrgan")
    w.add("esrgan.scale", 16)
    w.add("esrgan.block_count", 23)
    w.write()
    from vision_tpu.core.gguf import GGUFFile
    from vision_tpu.core.errors import VispError

    with pytest.raises(VispError):
        esrgan_detect_params(GGUFFile(tmp_path / "bad.gguf"))


def test_esrgan_packed_matches_naive():
    """The split-contribution restructure (esrgan_pack_weights /
    esrgan_generate_packed) is exactly the reference RDB math with the
    contraction regrouped by source — outputs must match the naive chain to
    float-reassociation tolerance."""
    from vision_tpu.models.esrgan import esrgan_generate_packed, esrgan_pack_weights
    from vision_tpu.models.random_weights import random_esrgan_params

    p = EsrganParams(scale=4, n_blocks=2)
    params = random_esrgan_params(seed=3, nf=16, nb=2, gc=8)
    x = np.random.default_rng(7).standard_normal((1, 12, 14, 3)).astype(np.float32) * 0.3
    ref = esrgan_generate(Params(params), x, p)
    packed = esrgan_pack_weights(params, p)
    fast = esrgan_generate_packed(packed, x, p)
    assert np.allclose(np.asarray(ref), np.asarray(fast), atol=2e-5), (
        np.abs(np.asarray(ref) - np.asarray(fast)).max()
    )


def test_esrgan_model_uses_packed_path(tmp_path):
    """EsrganModel.compute (whole + tiled) runs the packed path end to end."""
    from vision_tpu.core.device import BackendType, backend_init

    t = randomize(RRDBNet(nf=8, nb=1, gc=4, scale=4))
    path = _write_gguf(tmp_path / "esrgan.gguf", t, 4, 1)
    model = esrgan_load_model(str(path), backend_init(BackendType.cpu))
    img_u8 = np.random.default_rng(5).integers(0, 256, (20, 24, 3)).astype(np.uint8)
    out = model.compute(image_load_array(img_u8))  # whole-image path
    with torch.no_grad():
        y = t(torch.from_numpy(img_u8.astype(np.float32) / 255.0).permute(2, 0, 1)[None])
    expected = np.clip(y[0].permute(1, 2, 0).numpy(), 0, 1) * 255.0
    rms = np.sqrt((((expected - out.data[:, :, :3].astype(np.float32)) / 255.0) ** 2).mean())
    assert rms < 0.01, rms
