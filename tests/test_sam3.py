"""SAM3 parity tests (reference tests/test_sam3.py pattern + the CLIP
tokenizer cases from tests/test-ml.cpp:105-126)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vision_tpu.core.gguf import GGUFWriter, GGUFFile
from vision_tpu.core.params import Params
from vision_tpu.models.sam3 import (
    ClipTokenizer,
    Sam3VitParams,
    apply_rope_2d,
    clip_encode_text,
    clip_tokenizer_init,
    encode_vision,
    fpn_layer,
    rope_attention,
    sine_position_embedding,
    vision_embed,
    vision_layer,
    vision_transformer,
)

from workbench import input_tensor, make_params, randomize, tensors_match, to_nhwc


# -- tokenizer --


def _mini_tokenizer():
    tokens = ["<unk>", "a", "b", "c", "a</w>", "b</w>", "c</w>", "ab", "ab</w>", "abc</w>", "1</w>", "!</w>", "<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    merges = [("a", "b"), ("ab", "c</w>"), ("a", "b</w>")]
    return ClipTokenizer(
        vocab=vocab,
        bpe_rank={m: i for i, m in enumerate(merges)},
        bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
        unk_token_id=vocab["<unk>"],
    )


def test_tokenizer_bpe_merges():
    tk = _mini_tokenizer()
    out = tk.tokenize("abc", 8)
    # 'abc' -> chars [a, b, c</w>] -> merge(a,b)->ab -> merge(ab,c</w>)->abc</w>
    assert list(out.token_ids[:3]) == [tk.bos_token_id, tk.vocab["abc</w>"], tk.eos_token_id]
    assert (out.token_ids[3:] == tk.pad_token_id).all()


def test_tokenizer_mask_causal():
    tk = _mini_tokenizer()
    out = tk.tokenize("ab", 6)
    m = out.attention_mask
    # rows 0..2 are bos, 'ab</w>', eos -> causal lower triangle
    for r in range(3):
        assert (m[r, : r + 1] == 0).all()
        assert np.isneginf(m[r, r + 1 :]).all()
    # pad rows attend to everything up to eos
    for r in range(3, 6):
        assert (m[r, :3] == 0).all()
        assert np.isneginf(m[r, 3:]).all()


def test_tokenizer_normalize_and_split():
    tk = _mini_tokenizer()
    out = tk.tokenize("AB! 1", 8)
    # 'ab' word, '!' punctuation, '1' digit
    assert list(out.token_ids[:5]) == [
        tk.bos_token_id, tk.vocab["ab</w>"], tk.vocab["!</w>"], tk.vocab["1</w>"], tk.eos_token_id,
    ]


def test_tokenizer_from_gguf(tmp_path):
    w = GGUFWriter(tmp_path / "t.gguf", "sam3")
    w.add("tokenizer.ggml.tokens", ["<unk>", "h", "i</w>", "hi</w>"])
    w.add("tokenizer.ggml.merges", ["h i</w>"])
    w.add("tokenizer.ggml.bos_token_id", 10)
    w.add("tokenizer.ggml.eos_token_id", 11)
    w.add("tokenizer.ggml.padding_token_id", 11)
    w.add("tokenizer.ggml.unknown_token_id", 0)
    w.write()
    tk = clip_tokenizer_init(GGUFFile(tmp_path / "t.gguf"))
    out = tk.tokenize("hi", 4)
    assert list(out.token_ids) == [10, 3, 11, 11]


# -- CLIP text encoder --


class TClipLayer(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.layer_norm1 = nn.LayerNorm(dim)
        self.layer_norm2 = nn.LayerNorm(dim)
        sa = nn.Module()
        sa.q_proj, sa.k_proj, sa.v_proj, sa.out_proj = (nn.Linear(dim, dim) for _ in range(4))
        self.self_attn = sa
        mlp = nn.Module()
        mlp.fc1, mlp.fc2 = nn.Linear(dim, dim * 4), nn.Linear(dim * 4, dim)
        self.mlp = mlp
        self.heads = heads

    def forward(self, x, mask):
        b, t, c = x.shape
        hd = c // self.heads
        h = self.layer_norm1(x)
        sa = self.self_attn
        q, k, v = sa.q_proj(h), sa.k_proj(h), sa.v_proj(h)
        q, k, v = (z.view(b, t, self.heads, hd).permute(0, 2, 1, 3) for z in (q, k, v))
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(hd) + mask
        o = (attn.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, t, c)
        x = x + sa.out_proj(o)
        h = self.layer_norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h), approximate="tanh"))


class TClipText(nn.Module):
    def __init__(self, vocab=32, dim=16, heads=4, layers=2, max_pos=8):
        super().__init__()
        emb = nn.Module()
        emb.token_embedding = nn.Embedding(vocab, dim)
        emb.position_embedding = nn.Embedding(max_pos, dim)
        self.embeddings = emb
        enc = nn.Module()
        enc.layers = nn.ModuleList([TClipLayer(dim, heads) for _ in range(layers)])
        self.encoder = enc
        self.final_layer_norm = nn.LayerNorm(dim)

    def forward(self, ids, mask):
        x = self.embeddings.token_embedding(ids) + self.embeddings.position_embedding.weight[: ids.shape[1]]
        for lay in self.encoder.layers:
            x = lay(x, mask)
        return self.final_layer_norm(x)


def test_clip_text_encoder():
    t = randomize(TClipText())
    ids = torch.tensor([[5, 9, 2, 2, 2, 2, 2, 2]])
    mask = torch.triu(torch.full((8, 8), float("-inf")), diagonal=1)
    with torch.no_grad():
        expected = t(ids, mask)
    # clip_attention hardcodes 16 heads in reference; ours takes n_heads via
    # the layer fn — test via clip_encode_text with patched heads
    from vision_tpu.models import sam3 as s3

    orig = s3.clip_attention
    s3.clip_attention = lambda p, x, m, n_heads=4: orig(p, x, m, 4)
    try:
        actual = clip_encode_text(make_params(t), ids.numpy(), mask.numpy(), n_layers=2)
    finally:
        s3.clip_attention = orig
    tensors_match(expected, actual, label="clip_text", atol=1e-4)


# -- RoPE --


def t_rope_half(x, positions, scale, base=10000.0):
    """ggml ROPE_TYPE_NORMAL on adjacent pairs: theta = pos*scale*base^(-2i/d)."""
    d = x.shape[-1]
    i = torch.arange(d // 2, dtype=torch.float64)
    freqs = base ** (-2.0 * i / d)
    ang = torch.as_tensor(positions, dtype=torch.float64)[:, None] * scale * freqs[None]
    cos, sin = torch.cos(ang).float(), torch.sin(ang).float()
    x0, x1 = x[..., 0::2], x[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = torch.stack([r0, r1], -1).reshape(x.shape)
    return out


def test_apply_rope_2d():
    g = torch.Generator().manual_seed(9)
    x = torch.randn(1, 2, 9, 8, generator=g)  # T=9 (3x3 grid), head_dim 8
    pos = torch.arange(9)
    px, py = pos % 3, pos // 3
    first = t_rope_half(x[..., :4], px, 0.5)
    second = t_rope_half(x[..., 4:], py, 0.5)
    expected = torch.cat([first, second], -1)
    actual = apply_rope_2d(x.numpy(), n_rows=3, scale=0.5)
    tensors_match(expected, actual, label="rope2d", atol=1e-5)


class TRopeAttention(nn.Module):
    def __init__(self, dim, heads, n_rows, scale):
        super().__init__()
        self.q_proj, self.k_proj, self.v_proj, self.o_proj = (nn.Linear(dim, dim) for _ in range(4))
        self.heads, self.n_rows, self.scale = heads, n_rows, scale

    def forward(self, x):
        b, t, c = x.shape
        hd = c // self.heads
        q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q, k, v = (z.view(b, t, self.heads, hd).permute(0, 2, 1, 3) for z in (q, k, v))
        pos = torch.arange(t)
        px, py = pos % self.n_rows, pos // self.n_rows

        def rope(z):
            return torch.cat(
                [t_rope_half(z[..., : hd // 2], px, self.scale), t_rope_half(z[..., hd // 2 :], py, self.scale)], -1
            )

        q, k = rope(q), rope(k)
        attn = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
        o = (attn.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, t, c)
        return self.o_proj(o)


def test_rope_attention():
    t = randomize(TRopeAttention(16, 4, 3, 1.0))
    x = input_tensor(2, 9, 16)
    with torch.no_grad():
        expected = t(x)
    actual = rope_attention(make_params(t), x.numpy(), 4, 3, 1.0)
    tensors_match(expected, actual, label="rope_attn", atol=1e-4)


# -- vision transformer + neck --


class TVisionLayer(nn.Module):
    def __init__(self, dim, heads, window, n_rows, scale):
        super().__init__()
        self.layer_norm1 = nn.LayerNorm(dim)
        self.layer_norm2 = nn.LayerNorm(dim)
        self.attention = TRopeAttention(dim, heads, n_rows, scale)
        mlp = nn.Module()
        mlp.fc1, mlp.fc2 = nn.Linear(dim, dim * 4), nn.Linear(dim * 4, dim)
        self.mlp = mlp
        self.window = window

    def forward(self, x):  # x: (B, h, w, C)
        from test_mobile_sam import t_window_partition, t_window_reverse

        b, h, w, c = x.shape
        res = x
        y = self.layer_norm1(x)
        if self.window > 0:
            y = t_window_partition(y, self.window)
            y = self.attention(y)
            y = t_window_reverse(y, w, h, self.window)
        else:
            y = self.attention(y.reshape(b, h * w, c)).reshape(b, h, w, c)
        x = res + y
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.layer_norm2(x)), approximate="tanh"))


def test_vision_layer_window_and_global():
    for window, n_rows, scale in [(2, 2, 1.0), (0, 4, 0.5)]:
        t = randomize(TVisionLayer(8, 2, window, n_rows, scale))
        x = input_tensor(1, 4, 4, 8)  # NHWC-style (B,h,w,C)
        with torch.no_grad():
            expected = t(x)
        actual = vision_layer(make_params(t), x.numpy(), window, 2, n_rows, scale)
        tensors_match(expected, actual, label=f"vlayer{window}", atol=1e-4)


class TVit(nn.Module):
    def __init__(self, dim=8, heads=2, layers=3, patch=4, pretrain_grid=4, window=2, glob=(1,), img=16):
        super().__init__()
        emb = nn.Module()
        pe = nn.Module()
        pe.projection = nn.Conv2d(3, dim, patch, stride=patch)
        emb.patch_embeddings = pe
        emb.position_embeddings = nn.Parameter(torch.randn(pretrain_grid * pretrain_grid, dim) * 0.1)
        self.embeddings = emb
        self.layer_norm = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        n_rows_global = img // patch
        scale_global = window / (img // patch)
        for i in range(layers):
            if i in glob:
                self.layers.append(TVisionLayer(dim, heads, 0, n_rows_global, scale_global))
            else:
                self.layers.append(TVisionLayer(dim, heads, window, window, 1.0))
        self.pretrain_grid = pretrain_grid

    def forward(self, x):
        e = self.embeddings
        y = e.patch_embeddings.projection(x).permute(0, 2, 3, 1)  # (B,hp,wp,C)
        b, hp, wp, c = y.shape
        g = self.pretrain_grid
        grid = e.position_embeddings.reshape(g, g, c)
        if (hp, wp) != (g, g):
            grid = grid.repeat((hp + g - 1) // g, (wp + g - 1) // g, 1)[:hp, :wp]
        y = y + grid
        y = self.layer_norm(y)
        for lay in self.layers:
            y = lay(y)
        return y


def test_vision_transformer_full():
    t = randomize(TVit())
    x = input_tensor(1, 3, 16, 16)
    with torch.no_grad():
        expected = t(x)
    vp = Sam3VitParams(image_size=16, patch_size=4, window_size=2, n_layers=3, n_heads=2, global_attn_indexes=(1,))
    actual = vision_transformer(make_params(t), to_nhwc(x), vp)
    tensors_match(expected, actual, label="sam3_vit", atol=1e-4, rtol=1e-3)


def test_vision_transformer_scan_matches_layerwise():
    """The fused window-major scan trunk (vision_transformer_scan) must be
    numerically equivalent to the per-layer path: same math, tokens merely
    visit the global layers in window-major order with permuted RoPE
    tables (attention is permutation-invariant over tokens)."""
    from vision_tpu.models.sam3 import sam3_pack_vision_weights, vision_transformer_scan

    t = randomize(TVit())
    x = input_tensor(1, 3, 16, 16)
    vp = Sam3VitParams(
        image_size=16, patch_size=4, window_size=2, n_layers=3, n_heads=2, global_attn_indexes=(1,)
    )
    p = make_params(t)
    expected = vision_transformer(p, to_nhwc(x), vp)
    from workbench import state_dict_to_params

    flat = state_dict_to_params(t.state_dict())
    stack = sam3_pack_vision_weights(flat, vp, prefix="")
    actual = vision_transformer_scan(p, stack, to_nhwc(x), vp)
    tensors_match(torch.from_numpy(np.asarray(expected)), actual, label="sam3_scan", atol=1e-5)


def test_sine_position_embedding():
    """Direct port of the reference loop (sam3.h:524-563)."""
    W, H, NF = 3, 4, 6
    pe = sine_position_embedding(W, H, NF, True)
    temperature, scale, eps = 10000.0, 2 * math.pi, 1e-6
    for h in range(H):
        y = (h + 1) / (H + eps) * scale
        for w in range(W):
            x = (w + 1) / (W + eps) * scale
            for k in range(NF):
                dim_t = temperature ** (2.0 * (k // 2) / NF)
                yv = math.sin(y / dim_t) if k % 2 == 0 else math.cos(y / dim_t)
                xv = math.sin(x / dim_t) if k % 2 == 0 else math.cos(x / dim_t)
                assert pe[h, w, k] == pytest.approx(yv, abs=1e-5)
                assert pe[h, w, NF + k] == pytest.approx(xv, abs=1e-5)


class TFpnLayer(nn.Module):
    def __init__(self, ci, co, index):
        super().__init__()
        if index == 0:
            self.scale_layers = nn.ModuleList([
                nn.ConvTranspose2d(ci, ci // 2, 2, 2), nn.Identity(), nn.ConvTranspose2d(ci // 2, ci // 4, 2, 2),
            ])
            c_in = ci // 4
        elif index == 1:
            self.scale_layers = nn.ModuleList([nn.ConvTranspose2d(ci, ci // 2, 2, 2)])
            c_in = ci // 2
        else:
            c_in = ci
        self.proj1 = nn.Conv2d(c_in, co, 1)
        self.proj2 = nn.Conv2d(co, co, 3, padding=1)
        self.index = index

    def forward(self, x):
        if self.index == 0:
            x = self.scale_layers[2](F.gelu(self.scale_layers[0](x), approximate="tanh"))
        elif self.index == 1:
            x = self.scale_layers[0](x)
        elif self.index == 3:
            x = F.max_pool2d(x, 2, 2)
        return self.proj2(self.proj1(x))


@pytest.mark.parametrize("index", [0, 1, 2, 3])
def test_fpn_layer(index):
    t = randomize(TFpnLayer(8, 6, index))
    x = input_tensor(1, 8, 8, 8)
    with torch.no_grad():
        expected = to_nhwc(t(x))
    actual = fpn_layer(make_params(t), to_nhwc(x), index)
    tensors_match(torch.from_numpy(expected), actual, label=f"fpn{index}", atol=1e-4)


def test_vision_stack_drops_flat_window_weights():
    """After the first pack, the flat window-layer weights leave
    model.params (the scan trunk reads only the stack — keeping both would
    double the ViT-H trunk's HBM; review r4c). Global layers stay, the
    caller's dict is untouched, and the vision program still traces
    against the reduced dict."""
    import jax
    import jax.numpy as jnp

    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.random_weights import random_sam3_vision_params
    from vision_tpu.models.sam3 import Sam3Model

    dev = backend_init(BackendType.cpu)
    params = {f"det.ve.{k}": v for k, v in random_sam3_vision_params(dim=64, layers=4).items()}

    class _Tok:
        pass

    vp = Sam3VitParams(n_layers=4, n_heads=2, global_attn_indexes=(1, 3))
    model = Sam3Model(dict(params), _Tok(), 32, dev, vp=vp)
    stack = model._vision_stack()
    assert not any(".layers.0." in k or ".layers.2." in k for k in model.params)  # windows
    assert any(".layers.1." in k for k in model.params)  # globals stay
    assert any(".layers.0." in k for k in params)  # caller's dict untouched
    assert model._vision_stack() is stack  # cached
    jax.eval_shape(
        model._vision_fn, model.params, stack, jnp.zeros((1, 1008, 1008, 3), jnp.float32)
    )
    model._vision_fn.clear_cache()
