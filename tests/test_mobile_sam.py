"""MobileSAM parity tests — torch TinyViT + SAM decoder replicas vs the
framework (reference tests/test_mobile_sam.py pattern). State dicts are
converted with the same conv+BN fusion and attention-bias indexing the
reference converter applies (scripts/convert.py:220-262)."""

import itertools
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import (
    SamParams,
    TinyVitLayer,
    TinyVitParams,
    attention_rel_bias,
    mb_conv,
    patch_embed,
    patch_merging,
    predict_masks,
    sam_process_input,
    sam_process_mask,
    sam_process_point,
    tiny_vit,
    tiny_vit_block,
    two_way_transformer,
    window_partition,
    window_reverse,
)

from workbench import (
    fuse_conv_bn,
    input_tensor,
    make_params,
    randomize,
    state_dict_to_params,
    tensors_match,
    to_nhwc,
)


def build_attention_bias_indices(resolution: int) -> torch.Tensor:
    points = list(itertools.product(range(resolution), range(resolution)))
    n = len(points)
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return torch.LongTensor(idxs).view(n, n)


class Conv2dBN(nn.Module):
    def __init__(self, ci, co, k=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.c = nn.Conv2d(ci, co, k, stride, pad, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, x):
        return self.bn(self.c(x))


def fuse_params(module: nn.Module, prefix: str = "") -> Params:
    """Convert a torch state dict the way the reference converter does:
    fuse `.c` conv + `.bn` into c.weight/c.bias, index attention biases."""
    sd = {k: v.detach() for k, v in module.state_dict().items()}
    out = {}
    for k, v in sd.items():
        if k.endswith("c.weight"):
            base = k[: -len("c.weight")]
            if base + "bn.weight" in sd:
                w, b = fuse_conv_bn(
                    v, None, sd[base + "bn.weight"], sd[base + "bn.bias"],
                    sd[base + "bn.running_mean"], sd[base + "bn.running_var"],
                )
                out[prefix + base + "c.weight"] = w.numpy()
                out[prefix + base + "c.bias"] = b.numpy()
                continue
        if ".bn." in k:
            continue
        if k.endswith("attention_biases"):
            heads = v.shape[0]
            res = int(math.sqrt(_bias_n(v, module, k)))
            idxs = build_attention_bias_indices(res)
            out[prefix + k + "_indexed"] = v[:, idxs].numpy()
            continue
        out[prefix + k] = v.numpy()
    return Params(out)


def _bias_n(v, module, key):
    # find the module owning this bias to get its resolution
    mod = module
    for part in key.split(".")[:-1]:
        mod = getattr(mod, part) if not part.isdigit() else mod[int(part)]
    return mod.attention_bias_idxs_n


# -- torch TinyViT replica --


class TMBConv(nn.Module):
    def __init__(self, ch, expand=4):
        super().__init__()
        hid = ch * expand
        self.conv1 = Conv2dBN(ch, hid, 1)
        self.conv2 = Conv2dBN(hid, hid, 3, 1, 1, groups=hid)
        self.conv3 = Conv2dBN(hid, ch, 1)

    def forward(self, x):
        s = x
        x = F.gelu(self.conv1(x), approximate="tanh")
        x = F.gelu(self.conv2(x), approximate="tanh")
        x = self.conv3(x)
        return F.gelu(x + s, approximate="tanh")


class TPatchMerging(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv1 = Conv2dBN(ci, co, 1)
        stride = 1 if co in (320, 448, 576) else 2
        self.conv2 = Conv2dBN(co, co, 3, stride, 1, groups=co)
        self.conv3 = Conv2dBN(co, co, 1)

    def forward(self, x):
        x = F.gelu(self.conv1(x), approximate="tanh")
        x = F.gelu(self.conv2(x), approximate="tanh")
        x = self.conv3(x)
        return x.flatten(2).transpose(1, 2)  # (B, T, C)


class TAttention(nn.Module):
    def __init__(self, dim, num_heads, resolution):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = dim // num_heads
        self.scale = self.key_dim**-0.5
        self.norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        points = list(itertools.product(range(resolution), range(resolution)))
        offsets = {}
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
        self.attention_biases = nn.Parameter(torch.randn(num_heads, len(offsets)) * 0.1)
        idxs = build_attention_bias_indices(resolution)
        self.register_buffer("bias_idxs", idxs, persistent=False)
        self.attention_bias_idxs_n = idxs.shape[0]

    def forward(self, x):
        b, n, c = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(b, n, self.num_heads, 3, self.key_dim)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
        attn = (q @ k.transpose(-1, -2)) * self.scale
        attn = attn + self.attention_biases[:, self.bias_idxs]
        attn = attn.softmax(-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(out)


class TMlp(nn.Module):
    def __init__(self, dim, ratio=4):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(self.norm(x)), approximate="tanh"))


def t_window_partition(x, window):
    b, h, w, c = x.shape
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    nh, nw = (h + ph) // window, (w + pw) // window
    x = x.view(b, nh, window, nw, window, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def t_window_reverse(x, w, h, window):
    ph = (window - h % window) % window
    pw = (window - w % window) % window
    nh, nw = (h + ph) // window, (w + pw) // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.view(b, nh, nw, window, window, c).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, h + ph, w + pw, c)
    return x[:, :h, :w, :]


class TTinyVitBlock(nn.Module):
    def __init__(self, dim, resolution, num_heads, window):
        super().__init__()
        self.attn = TAttention(dim, num_heads, window)
        self.local_conv = Conv2dBN(dim, dim, 3, 1, 1, groups=dim)
        self.mlp = TMlp(dim)
        self.dim, self.res, self.window = dim, resolution, window

    def forward(self, x):
        b, t, c = x.shape
        h = w = self.res
        res_x = x
        x = x.view(b, h, w, c)
        x = t_window_partition(x, self.window)
        x = self.attn(x)
        x = t_window_reverse(x, w, h, self.window)
        x = x.reshape(b, t, c) + res_x
        y = x.transpose(1, 2).reshape(b, c, h, w)
        y = self.local_conv(y)
        x = y.flatten(2).transpose(1, 2)
        return x + self.mlp(x)


class TTinyVit(nn.Module):
    def __init__(self, cfg, in_res):
        super().__init__()
        pe = nn.Module()
        pe.seq = nn.ModuleList([
            Conv2dBN(3, cfg[0]["dim"] // 2, 3, 2, 1), nn.Identity(), Conv2dBN(cfg[0]["dim"] // 2, cfg[0]["dim"], 3, 2, 1),
        ])
        self.patch_embed = pe
        layers = []
        # stage 0: conv
        l0 = nn.Module()
        l0.blocks = nn.ModuleList([TMBConv(cfg[0]["dim"]) for _ in range(cfg[0]["depth"])])
        l0.downsample = TPatchMerging(cfg[0]["dim"], cfg[1]["dim"])
        layers.append(l0)
        for i in range(1, len(cfg)):
            li = nn.Module()
            li.blocks = nn.ModuleList([
                TTinyVitBlock(cfg[i]["dim"], cfg[i]["res"], cfg[i]["heads"], cfg[i]["window"])
                for _ in range(cfg[i]["depth"])
            ])
            if i + 1 < len(cfg):
                li.downsample = TPatchMerging(cfg[i]["dim"], cfg[i + 1]["dim"])
            layers.append(li)
        self.layers = nn.ModuleList(layers)
        self.neck = nn.ModuleList([
            nn.Conv2d(cfg[-1]["dim"], 16, 1, bias=False), nn.LayerNorm(16),
            nn.Conv2d(16, 16, 3, padding=1, bias=False), nn.LayerNorm(16),
        ])
        self.cfg = cfg

    def forward(self, x):
        x = F.gelu(self.patch_embed.seq[0](x), approximate="tanh")
        x = self.patch_embed.seq[2](x)
        for blk in self.layers[0].blocks:
            x = blk(x)
        x = self.layers[0].downsample(x)
        for i in range(1, len(self.cfg)):
            li = self.layers[i]
            for blk in li.blocks:
                x = blk(x)
            if hasattr(li, "downsample"):
                b, t, c = x.shape
                r = self.cfg[i]["res"]
                x = x.transpose(1, 2).reshape(b, c, r, r)
                x = li.downsample(x)
        b, t, c = x.shape
        r = self.cfg[-1]["res"]
        x = x.view(b, r, r, c)
        x = self.neck[0](x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        x = self.neck[1](x)
        x = self.neck[2](x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        x = self.neck[3](x)
        return x  # NHWC


TEST_CFG = [
    {"dim": 8, "depth": 1, "res": 14},
    {"dim": 16, "depth": 1, "res": 7, "heads": 2, "window": 4},
    {"dim": 320, "depth": 1, "res": 7, "heads": 10, "window": 4},
]
TEST_TP = TinyVitParams(
    img_size=56,
    layers=(
        TinyVitLayer(14, 8, 1, 0, 0, True),
        TinyVitLayer(7, 16, 1, 2, 4, True),
        TinyVitLayer(7, 320, 1, 10, 4, False),
    ),
)


def test_window_partition_roundtrip():
    x = input_tensor(2, 9, 11, 5)  # (B,H,W,C) non-divisible
    w = window_partition(x.numpy(), 4)
    assert w.shape == (2 * 3 * 3, 16, 5)
    back = window_reverse(w, 11, 9, 4)
    np.testing.assert_allclose(np.asarray(back), x.numpy(), atol=1e-6)
    tw = t_window_partition(x, 4)
    np.testing.assert_allclose(np.asarray(w), tw.numpy(), atol=1e-6)


def test_mb_conv():
    t = randomize(TMBConv(8))
    x = input_tensor(1, 8, 14, 14)
    expected = to_nhwc(t(x))
    actual = mb_conv(fuse_params(t), to_nhwc(x))
    tensors_match(torch.from_numpy(expected), actual, label="mbconv", atol=1e-3)


def test_patch_merging_stride2():
    t = randomize(TPatchMerging(8, 16))
    x = input_tensor(1, 8, 14, 14)
    expected = t(x)
    actual = patch_merging(fuse_params(t), to_nhwc(x))
    tensors_match(expected, actual, label="merge2", atol=1e-3)


def test_patch_merging_stride1():
    t = randomize(TPatchMerging(16, 320))
    x = input_tensor(1, 16, 7, 7)
    expected = t(x)
    actual = patch_merging(fuse_params(t), to_nhwc(x))
    tensors_match(expected, actual, label="merge1", atol=1e-3)


def test_attention_rel_bias():
    t = randomize(TAttention(16, 2, 4))
    x = input_tensor(3, 16, 16)
    expected = t(x)
    p = fuse_params(t)
    # torch applies norm inside; attention_rel_bias expects norm at "norm"
    actual = attention_rel_bias(p, x.numpy(), dim=16, n_heads=2)
    tensors_match(expected, actual, label="relbias", atol=1e-4)


def test_tiny_vit_block():
    t = randomize(TTinyVitBlock(16, 7, 2, 4))
    x = input_tensor(1, 49, 16)
    expected = t(x)
    actual = tiny_vit_block(fuse_params(t), x.numpy(), 7, 16, 2, 4)
    tensors_match(expected, actual, label="tvblock", atol=1e-3)


def test_tiny_vit_full():
    t = randomize(TTinyVit(TEST_CFG, 56))
    x = input_tensor(1, 3, 56, 56)
    with torch.no_grad():
        expected = t(x)
    actual = tiny_vit(fuse_params(t), to_nhwc(x), TEST_TP)
    tensors_match(expected, actual, label="tinyvit", atol=5e-3, rtol=1e-2)


# -- decoder --


class TDecoderAttention(nn.Module):
    def __init__(self, dim, n_heads, downsample=1):
        super().__init__()
        inner = dim // downsample
        self.q_proj = nn.Linear(dim, inner)
        self.k_proj = nn.Linear(dim, inner)
        self.v_proj = nn.Linear(dim, inner)
        self.out_proj = nn.Linear(inner, dim)
        self.n_heads = n_heads

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, tq, c = q.shape
        hd = c // self.n_heads
        sh = lambda z: z.view(b, z.shape[1], self.n_heads, hd).permute(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
        out = (attn.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, tq, c)
        return self.out_proj(out)


class TTwoWayBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.self_attn = TDecoderAttention(dim, heads)
        self.cross_attn_t2i = TDecoderAttention(dim, heads, 2)
        self.cross_attn_i2t = TDecoderAttention(dim, heads, 2)
        self.norm1, self.norm2, self.norm3, self.norm4 = (nn.LayerNorm(dim) for _ in range(4))
        mlpm = nn.Module()
        mlpm.lin1 = nn.Linear(dim, dim * 4)
        mlpm.lin2 = nn.Linear(dim * 4, dim)
        self.mlp = mlpm

    def forward(self, queries, keys, qpe, kpe, skip_pe):
        if skip_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + qpe
        k = keys + kpe
        queries = queries + self.cross_attn_t2i(q, k, keys)
        queries = self.norm2(queries)
        queries = self.norm3(queries + self.mlp.lin2(F.relu(self.mlp.lin1(queries))))
        q = queries + qpe
        keys = keys + self.cross_attn_i2t(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class TTwoWay(nn.Module):
    def __init__(self, dim=32, heads=8, depth=2):
        super().__init__()
        self.layers = nn.ModuleList([TTwoWayBlock(dim, heads) for _ in range(depth)])
        self.final_attn_t2i = TDecoderAttention(dim, heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        b, c, h, w = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        image_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        for i, lay in enumerate(self.layers):
            queries, keys = lay(queries, keys, point_embedding, image_pe, i == 0)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + self.final_attn_t2i(q, k, keys)
        return self.norm_final_attn(queries), keys


def test_two_way_transformer():
    dim = 32
    t = randomize(TTwoWay(dim))
    emb = input_tensor(1, dim, 8, 8)
    pe = input_tensor(1, dim, 8, 8, seed=3)
    pts = input_tensor(1, 6, dim, seed=4)
    with torch.no_grad():
        eq, ek = t(emb, pe, pts)
    q, k = two_way_transformer(
        make_params(t), to_nhwc(emb), to_nhwc(pe).reshape(1, 64, dim), pts.numpy(), 2, 8
    )
    tensors_match(eq, q, label="twoway_q", atol=1e-4)
    tensors_match(ek, k, label="twoway_k", atol=1e-4)


class TMaskDecoder(nn.Module):
    def __init__(self, dim=32, up1=8, up2=4):
        super().__init__()
        self.transformer = TTwoWay(dim)
        self.iou_token = nn.Embedding(1, dim)
        self.mask_tokens = nn.Embedding(4, dim)
        self.output_upscaling = nn.ModuleList([
            nn.ConvTranspose2d(dim, up1, 2, 2), nn.LayerNorm(up1), nn.Identity(),
            nn.ConvTranspose2d(up1, up2, 2, 2),
        ])
        def mlp3(din, dh, dout):
            m = nn.Module()
            m.layers = nn.ModuleList([nn.Linear(din, dh), nn.Linear(dh, dh), nn.Linear(dh, dout)])
            return m
        self.output_hypernetworks_mlps = nn.ModuleList([mlp3(dim, dim, up2) for _ in range(4)])
        self.iou_prediction_head = mlp3(dim, dim, 4)

    def run_mlp(self, m, x):
        for i, lay in enumerate(m.layers):
            x = lay(x)
            if i < len(m.layers) - 1:
                x = F.relu(x)
        return x

    def forward(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        out_tokens = torch.cat([self.iou_token.weight, self.mask_tokens.weight], dim=0)
        out_tokens = out_tokens.unsqueeze(0).expand(sparse_prompt.shape[0], -1, -1)
        tokens = torch.cat([out_tokens, sparse_prompt], dim=1)
        src = image_embeddings + dense_prompt.reshape(1, -1, 1, 1)
        hs, out = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:5]
        b, t, c = out.shape
        g = int(math.sqrt(t))
        src2 = out.transpose(1, 2).reshape(b, c, g, g)
        u = self.output_upscaling
        x = u[0](src2)
        x = u[1](x.permute(0, 2, 3, 1))
        x = F.gelu(x.permute(0, 3, 1, 2), approximate="tanh")
        x = F.gelu(u[3](x), approximate="tanh")
        b, c2, h2, w2 = x.shape
        up = x.flatten(2)  # (B, c2, h2*w2)
        hyper = torch.stack(
            [self.run_mlp(self.output_hypernetworks_mlps[i], mask_tokens_out[:, i]) for i in range(4)], dim=1
        )
        masks = hyper @ up  # (B, 4, h2*w2)
        masks = masks.view(b, 4, h2, w2)
        iou = self.run_mlp(self.iou_prediction_head, iou_token_out)
        return masks, iou


def test_predict_masks():
    t = randomize(TMaskDecoder())
    emb = input_tensor(1, 32, 8, 8)
    pe = input_tensor(1, 32, 8, 8, seed=5)
    sparse = input_tensor(1, 2, 32, seed=6)
    dense = input_tensor(32, seed=7)
    with torch.no_grad():
        em, eiou = t(emb, pe, sparse, dense)
    store = state_dict_to_params(t.state_dict())
    store["dense_positional_embedding"] = to_nhwc(pe)[0]
    p = Params(store)
    pred = predict_masks(p, to_nhwc(emb), sparse.numpy(), dense.numpy())
    tensors_match(em, pred.masks, label="masks", atol=1e-4)
    tensors_match(eiou, pred.iou, label="iou", atol=1e-4)


# -- pre/post processing --


def test_sam_process_point():
    c = sam_process_point((100, 200), (2000, 1000), SamParams())
    scale = 1024.0 / 2000.0
    assert c.shape == (2, 2)
    assert c[0, 0] == pytest.approx(2 * ((100 * scale + 0.5) / 1024) - 1)
    assert c[0, 1] == pytest.approx(2 * ((200 * scale + 0.5) / 1024) - 1)
    assert (c[1] == 0).all()


def test_sam_process_input_shape():
    from vision_tpu.image import image_load_array

    img = image_load_array(np.random.default_rng(0).integers(0, 256, (100, 200, 3)).astype(np.uint8))
    x = sam_process_input(img, SamParams())
    assert x.shape == (1024, 1024, 3)
    # bottom area is replicate-padded from the resized content (512 rows)
    assert np.isfinite(x).all()


def test_sam_process_mask_threshold():
    masks = np.full((4, 256, 256), -1.0, np.float32)
    masks[1, 100:150, 50:100] = 5.0
    out = sam_process_mask(masks, 1, (512, 512), SamParams())
    assert out.extent == (512, 512)
    assert out.data.max() == 255 and out.data.min() == 0
    # center of the positive region maps to scaled coordinates
    assert out.data[250, 150, 0] == 255
