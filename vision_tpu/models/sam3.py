"""SAM3 (work-in-progress parity with the reference's WIP scope:
CLIP BPE tokenizer + 24-layer CLIP text encoder + RoPE-ViT vision encoder +
FPN neck; no decoder yet).

TPU-native re-provision of src/visp/arch/sam3.h:

  * tokenizer: lowercase + regex pre-tokenization, char split with </w>
    end-of-word marker, rank-ordered BPE merges, padding-aware causal mask
    (sam3.h:80-216); vocab/merges come from GGUF string-array metadata.
  * text encoder: token+position embeddings, 24 pre-LN blocks, 16 heads,
    final layer norm, optional text projection (sam3.h:219-288).
  * vision encoder: 1008px/patch14 ViT, 32 layers with window attention
    (24) and 4 global layers, tiled absolute position embeddings, and 2D
    RoPE — x-positions rotate the first half of head_dim, y-positions the
    second half (sam3.h:291-515). RoPE tables are trace-time numpy
    constants (the reference uploads host-computed index buffers).
  * FPN neck: 4 scale branches (x4 / x2 / x1 / x0.5) with 1x1+3x3
    projections and host-precomputed sine position embeddings
    (sam3.h:517-613).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFFile
from ..core.params import Params
from ..image import (
    Image,
    ImageFormat,
    image_scale,
    image_u8_to_f32,
    preprocess_scale_method,
)
from ..ops import (
    attention,
    conv_2d,
    conv_transpose_2d,
    gelu,
    layer_norm,
    linear,
    max_pool_2d,
)

__all__ = [
    "ClipTokenizer",
    "clip_tokenizer_init",
    "clip_encode_text",
    "encode_text",
    "Sam3VitParams",
    "vision_transformer",
    "vision_transformer_scan",
    "vision_transformer_pp",
    "sam3_pack_vision_weights",
    "sam3_pipeline_weights",
    "sam3_shard_vision",
    "sam3_window_runs",
    "encode_vision",
    "encode_vision_pipelined",
    "sam3_process_input",
    "sine_position_embedding",
]

NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# CLIP BPE tokenizer (reference sam3.h:80-216)
# ---------------------------------------------------------------------------

_PRETOKENIZE = re.compile(r"[a-zA-Z]+|[0-9]|[^\s\da-zA-Z]+")


class ClipTextTokens(NamedTuple):
    token_ids: np.ndarray  # (max_tokens,) int32
    attention_mask: np.ndarray  # (max_tokens, max_tokens) float32 0/-inf


@dataclass
class ClipTokenizer:
    vocab: dict[str, int]
    bpe_rank: dict[tuple[str, str], int]
    bos_token_id: int = 49406
    eos_token_id: int = 49407
    pad_token_id: int = 49407
    unk_token_id: int = 49407

    def apply_bpe(self, tokens: list[str]) -> list[str]:
        """Greedy lowest-rank merge loop (reference sam3.h:117-144)."""
        while len(tokens) > 1:
            best_rank, best_idx = None, -1
            for i in range(len(tokens) - 1):
                r = self.bpe_rank.get((tokens[i], tokens[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_idx = r, i
            if best_idx < 0:
                break
            tokens = (
                tokens[:best_idx]
                + [tokens[best_idx] + tokens[best_idx + 1]]
                + tokens[best_idx + 2 :]
            )
        return tokens

    def tokenize(self, text: str, max_tokens: int) -> ClipTextTokens:
        """(reference clip_tokenizer::tokenize, sam3.h:146-192)."""
        ids = np.full(max_tokens, self.pad_token_id, np.int32)
        mask = np.full((max_tokens, max_tokens), NEG_INF, np.float32)

        def fill(row, cols=None):
            cols = row + 1 if cols is None else cols
            mask[row, :cols] = 0.0

        i = 0
        ids[i] = self.bos_token_id
        fill(i)
        i += 1
        if text:
            for word in _PRETOKENIZE.findall(text.lower()):
                chars = [c for c in word[:-1]] + [word[-1] + "</w>"]
                for tok in self.apply_bpe(chars):
                    ids[i] = self.vocab.get(tok, self.unk_token_id)
                    fill(i)
                    i += 1
                    if i >= max_tokens - 1:
                        break
                if i >= max_tokens - 1:
                    break
        ids[i] = self.eos_token_id
        fill(i)
        for row in range(i + 1, max_tokens):
            fill(row, i + 1)
        return ClipTextTokens(ids, mask)


def clip_tokenizer_init(file: GGUFFile) -> ClipTokenizer:
    """(reference clip_tokenizer_init, sam3.h:195-216)."""
    tokens = file.get_array("tokenizer.ggml.tokens")
    merges = file.get_array("tokenizer.ggml.merges")
    vocab = {t: i for i, t in enumerate(tokens)}
    rank = {}
    for i, m in enumerate(merges):
        a, _, b = m.partition(" ")
        rank[(a, b)] = i
    return ClipTokenizer(
        vocab=vocab,
        bpe_rank=rank,
        bos_token_id=file.get_int("tokenizer.ggml.bos_token_id", 49406),
        eos_token_id=file.get_int("tokenizer.ggml.eos_token_id", 49407),
        pad_token_id=file.get_int("tokenizer.ggml.padding_token_id", 49407),
        unk_token_id=file.get_int("tokenizer.ggml.unknown_token_id", 49407),
    )


# ---------------------------------------------------------------------------
# CLIP text encoder (reference sam3.h:219-288)
# ---------------------------------------------------------------------------


def clip_text_embed(p: Params, ids):
    tok = p.weight("token_embedding.weight")[ids]
    pos = p.weight("position_embedding.weight")[: ids.shape[-1]]
    return tok + pos


def clip_attention(p: Params, x, mask, n_heads: int = 16):
    b, t, c = x.shape
    hd = c // n_heads

    def proj(pp):
        return jnp.transpose(linear(pp, x).reshape(b, t, n_heads, hd), (0, 2, 1, 3))

    q, k, v = proj(p["q_proj"]), proj(p["k_proj"]), proj(p["v_proj"])
    return attention(p["out_proj"], q, k, v, mask, 1.0 / math.sqrt(hd))


def clip_mlp(p: Params, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def clip_encoder_layer(p: Params, x, mask):
    x = x + clip_attention(p["self_attn"], layer_norm(p["layer_norm1"], x), mask)
    x = x + clip_mlp(p["mlp"], layer_norm(p["layer_norm2"], x))
    return x


def clip_encode_text(p: Params, ids, mask, n_layers: int = 24):
    """(reference clip_encode_text, sam3.h:277-282). ids: (B, T)."""
    x = clip_text_embed(p["embeddings"], ids)
    for i in range(n_layers):
        x = clip_encoder_layer(p["encoder"]["layers"][i], x, mask)
    return layer_norm(p["final_layer_norm"], x)


def encode_text(p: Params, ids, mask, n_layers: int = 24):
    """(reference encode_text, sam3.h:284-288). Text projection is optional
    (the converter skips it, convert.py convert_sam3)."""
    x = clip_encode_text(p["te.text_model"], ids, mask, n_layers)
    if p.has("text_projection.weight"):
        x = linear(p["text_projection"], x)
    return x


# ---------------------------------------------------------------------------
# Vision encoder (reference sam3.h:291-515)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Sam3VitParams:
    image_size: int = 1008
    patch_size: int = 14
    window_size: int = 24
    n_layers: int = 32
    n_heads: int = 16
    global_attn_indexes: tuple[int, ...] = (7, 15, 23, 31)
    scale_factors: tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)


def vision_embed(p: Params, image, patch_size: int):
    """Patch conv + tiled abs position embeddings (sam3.h:313-338).
    image: (B, H, W, 3) -> (B, hp, wp, C)."""
    x = conv_2d(p["patch_embeddings.projection"], image, patch_size)
    b, hp, wp, c = x.shape
    pos = p.weight("position_embeddings")  # (1, n, C) or (n, C)
    pos = pos.reshape(-1, pos.shape[-1])
    pre = int(math.sqrt(pos.shape[0]) + 0.5)
    if (wp, hp) == (pre, pre):
        grid = pos.reshape(pre, pre, c)
    else:
        grid = pos.reshape(pre, pre, c)
        grid = jnp.tile(grid, ((hp + pre - 1) // pre, (wp + pre - 1) // pre, 1))[:hp, :wp]
    return x + grid[None].astype(x.dtype)


@lru_cache(maxsize=32)
def _rope_tables(n_pos: int, n_rows: int, head_dim: int, scale: float):
    """cos/sin tables for 2D RoPE in row-major token order: x positions for
    the first half of head_dim, y for the second (sam3.h:391-438). Thin
    wrapper over _rope_tables_pos so the frequency math lives once."""
    pos = np.arange(n_pos)
    px = (pos % n_rows).astype(np.float64) * scale
    py = (pos // n_rows).astype(np.float64) * scale
    return _rope_tables_pos(px, py, head_dim)


def _rotate_pairs(x, cos, sin):
    """Rotate adjacent pairs (ggml ROPE_TYPE_NORMAL). x: (..., T, d)."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(x.shape)


def apply_rope_2d(x, n_rows: int, scale: float = 1.0, layout: str = "bhtd"):
    """2D RoPE. layout 'bhtd': x is (B, heads, T, head_dim);
    layout 'bthd': x is (B, T, heads, head_dim) — the transpose-free
    attention layout (tables broadcast over the heads axis)."""
    t = x.shape[-2] if layout == "bhtd" else x.shape[1]
    return _apply_rope_tables(x, _rope_tables(t, n_rows, x.shape[-1], scale), layout)


def _rope_tables_pos(px: np.ndarray, py: np.ndarray, head_dim: int):
    """cos/sin tables for explicit (possibly permuted) token positions.
    Attention is permutation-invariant over the token axis, so any token
    ordering works as long as RoPE sees the matching positions — the fused
    window-major path (vision_transformer_scan) relies on this."""
    base = 10000.0
    d2 = head_dim // 2
    freqs = base ** (-np.arange(0, d2, 2, dtype=np.float64) / d2)
    ang_x = px.astype(np.float64)[:, None] * freqs[None, :]
    ang_y = py.astype(np.float64)[:, None] * freqs[None, :]
    return (
        np.cos(ang_x).astype(np.float32),
        np.sin(ang_x).astype(np.float32),
        np.cos(ang_y).astype(np.float32),
        np.sin(ang_y).astype(np.float32),
    )


def _apply_rope_tables(x, tables, layout: str):
    """Apply rope from precomputed (cx, sx, cy, sy) numpy tables."""
    hd = x.shape[-1]
    if layout == "bhtd":
        cx, sx, cy, sy = (jnp.asarray(a).astype(x.dtype) for a in tables)
    else:  # bthd: broadcast over the heads axis
        cx, sx, cy, sy = (jnp.asarray(a)[:, None].astype(x.dtype) for a in tables)
    first = _rotate_pairs(x[..., : hd // 2], cx, sx)
    second = _rotate_pairs(x[..., hd // 2 :], cy, sy)
    return jnp.concatenate([first, second], axis=-1)


def rope_attention(
    p: Params, x, n_heads: int, n_rows: int, scale: float, flash: bool = False, tables=None
):
    """(reference rope_attention, sam3.h:440-455). x: (B, T, C).

    Window layers (flash=False, T <= ~576) use the transpose-free einsum
    formulation (see ops/nn.py attention_windows): q/k/v stay (B, T, H, hd),
    RoPE broadcasts over the heads axis, logits in the input dtype with f32
    softmax. Global layers keep (B, H, T, hd) for the pallas flash kernel.
    ``tables`` overrides the position tables (permuted token orders).
    """
    b, t, c = x.shape
    hd = c // n_heads

    if flash:
        def proj(pp):
            return jnp.transpose(linear(pp, x).reshape(b, t, n_heads, hd), (0, 2, 1, 3))

        q, k, v = proj(p["q_proj"]), proj(p["k_proj"]), proj(p["v_proj"])
        if tables is None:
            q = apply_rope_2d(q, n_rows, scale)
            k = apply_rope_2d(k, n_rows, scale)
        else:
            q = _apply_rope_tables(q, tables, "bhtd")
            k = _apply_rope_tables(k, tables, "bhtd")
        return attention(p["o_proj"], q, k, v, None, 1.0 / math.sqrt(hd), flash=flash)

    proj = lambda pp: linear(pp, x).reshape(b, t, n_heads, hd)
    q, k, v = proj(p["q_proj"]), proj(p["k_proj"]), proj(p["v_proj"])
    if tables is None:
        q = apply_rope_2d(q, n_rows, scale, layout="bthd")
        k = apply_rope_2d(k, n_rows, scale, layout="bthd")
    else:
        q = _apply_rope_tables(q, tables, "bthd")
        k = _apply_rope_tables(k, tables, "bthd")
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(1.0 / math.sqrt(hd), x.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
    return linear(p["o_proj"], o)


def vision_mlp(p: Params, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def _window_partition(x, window: int):
    from .mobile_sam import window_partition

    return window_partition(x, window)


def _window_reverse(x, w, h, window):
    from .mobile_sam import window_reverse

    return window_reverse(x, w, h, window)


def _vision_layer_tokens(p: Params, x, n_heads: int, n_rows: int, rope_scale: float, flash: bool = False, tables=None):
    """Pre-norm attention + MLP on token tensors (B*, T, C) — the layer body
    shared by the spatial path (vision_layer) and the window-major scan path
    (vision_transformer_scan)."""
    res = x
    y = layer_norm(p["layer_norm1"], x)
    y = rope_attention(p["attention"], y, n_heads, n_rows, rope_scale, flash=flash, tables=tables)
    x = res + y
    return x + vision_mlp(p["mlp"], layer_norm(p["layer_norm2"], x))


def vision_layer(p: Params, x, window_size: int, n_heads: int, n_rows: int, rope_scale: float, flash: bool = False):
    """(reference vision_layer, sam3.h:457-483). x: (B, h, w, C)."""
    b, h, w, c = x.shape
    res = x
    y = layer_norm(p["layer_norm1"], x)
    if window_size > 0:
        y = _window_partition(y, window_size)
    else:
        y = y.reshape(b, h * w, c)
    y = rope_attention(p["attention"], y, n_heads, n_rows, rope_scale, flash=flash)
    if window_size > 0:
        y = _window_reverse(y, w, h, window_size)
    else:
        y = y.reshape(b, h, w, c)
    x = res + y
    return x + vision_mlp(p["mlp"], layer_norm(p["layer_norm2"], x))


def vision_transformer(p: Params, image, vp: Sam3VitParams, flash: bool = False):
    """(reference vision_transformer, sam3.h:485-515).
    image: (B, H, W, 3) -> (B, hp, wp, C). ``flash`` routes the global
    layers (5184 tokens at 1008px) through the pallas fused attention."""
    x = vision_embed(p["embeddings"], image, vp.patch_size)
    x = layer_norm(p["layer_norm"], x)
    n_rows_global = image.shape[2] // vp.patch_size
    scale_global = float(vp.window_size) / float(vp.image_size // vp.patch_size)
    for i in range(vp.n_layers):
        is_global = i in vp.global_attn_indexes
        window = 0 if is_global else vp.window_size
        n_rows = n_rows_global if is_global else vp.window_size
        scale = scale_global if is_global else 1.0
        x = vision_layer(p["layers"][i], x, window, vp.n_heads, n_rows, scale, flash=is_global and flash)
    return x


# ---------------------------------------------------------------------------
# Fused trunk: window-major layout + lax.scan over stacked window layers
# ---------------------------------------------------------------------------
#
# The per-layer path above re-partitions (B, h, w, C) -> windows and back for
# every one of the 28 window layers (56 relayout transposes of the full 13 MB
# activation at 1008^2), and XLA schedules 28 distinct layer bodies whose
# 36 MB weight sets stream from HBM without any sequential-prefetch pattern —
# measured as ~30 ms of composition overhead that no layer shows in isolation
# (NOTES.md round-2 SAM3 breakdown; reference builds one fused graph,
# sam3.h:291-613). The fused trunk removes both:
#
#   * the activation lives in WINDOW-MAJOR token order (B*nw, win^2, C) for
#     the whole trunk — window partition becomes a free reshape; ONE real
#     transpose converts in after patch-embed and out before the neck.
#   * global layers run attention directly on the window-major token order:
#     attention is permutation-invariant over tokens, so only the RoPE
#     tables must be permuted to match (precomputed numpy, _rope_tables_pos)
#   * each run of consecutive window layers executes as ONE lax.scan over
#     stacked weights (sam3_pack_vision_weights): a single layer body whose
#     weights are dynamic-sliced per iteration — sequential HBM prefetch
#     instead of 28 independent weight sets, and ~7x less code to compile.

_SAM3_LAYER_LEAVES = tuple(
    f"{mod}.{leaf}"
    for mod in ("layer_norm1", "layer_norm2", "attention.q_proj", "attention.k_proj",
                "attention.v_proj", "attention.o_proj", "mlp.fc1", "mlp.fc2")
    for leaf in ("weight", "bias")
)


def sam3_window_runs(vp: Sam3VitParams) -> list[tuple[str, int, int]]:
    """Trunk schedule: [("win", start, count) | ("glb", layer_idx, 1), ...]
    where start/count index the stacked window-layer arrays."""
    runs: list[tuple[str, int, int]] = []
    w = 0
    for i in range(vp.n_layers):
        if i in vp.global_attn_indexes:
            runs.append(("glb", i, 1))
        else:
            if runs and runs[-1][0] == "win":
                runs[-1] = ("win", runs[-1][1], runs[-1][2] + 1)
            else:
                runs.append(("win", w, 1))
            w += 1
    return runs


@partial(jax.jit, static_argnums=(1, 2))
def _sam3_pack(params: dict, prefix: str, win_idx: tuple):
    return {
        leaf: jnp.stack([params[f"{prefix}layers.{i}.{leaf}"] for i in win_idx])
        for leaf in _SAM3_LAYER_LEAVES
    }


def sam3_pack_vision_weights(params: dict, vp: Sam3VitParams = Sam3VitParams(), prefix: str = "backbone.") -> dict:
    """Stack the window layers' weights into (n_window_layers, ...) arrays
    for the scan trunk. ``params`` holds flat dotted names; embeddings,
    norms, global layers, and the neck stay in the original dict (the
    packed dict only adds the stacked copies). One jitted program — eager
    stacking would be hundreds of small dispatches over the dev tunnel."""
    win_idx = tuple(i for i in range(vp.n_layers) if i not in vp.global_attn_indexes)
    return dict(_sam3_pack(params, prefix, win_idx))


def sam3_shard_vision(params: dict, win_stack: dict, mesh):
    """Place SAM3 weights on a (dp, tp) mesh for multi-chip inference.

    The ViT-H vision encoder is the one model in the set whose weights
    (~2.4 GB with the stacked trunk) genuinely want multiple chips.
    Flat params get Megatron-style tp via ``SAM3_TP_RULES`` (column-
    parallel q/k/v + fc1, row-parallel o_proj/fc2 — XLA inserts the psum);
    the scan-stacked window weights get the same specs shifted one axis
    right (leading axis = layer, consumed by lax.scan). Activations stay
    replicated: batch-1 panoptic encodes are the SAM3 serving shape.
    Returns ``(params, win_stack)`` re-placed.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import SAM3_TP_RULES, shard_params

    params = shard_params(params, mesh, SAM3_TP_RULES)
    tp = mesh.shape["tp"]
    out = {}
    for name, v in win_stack.items():
        spec = P()
        if tp > 1:
            if re.search(r"(q_proj|k_proj|v_proj|fc1)\.weight$", name) and v.shape[1] % tp == 0:
                spec = P(None, "tp", None)
            elif re.search(r"(q_proj|k_proj|v_proj|fc1)\.bias$", name) and v.shape[1] % tp == 0:
                spec = P(None, "tp")
            elif re.search(r"(o_proj|fc2)\.weight$", name) and v.shape[2] % tp == 0:
                spec = P(None, None, "tp")
        out[name] = jax.device_put(v, NamedSharding(mesh, spec))
    return params, out


def vision_transformer_scan(
    p: Params, win_stack: dict, image, vp: Sam3VitParams, flash: bool = False, mesh=None
):
    """Fused trunk (see block comment above). Exact same math as
    vision_transformer; requires the patch grid to divide into whole
    windows (true at the canonical 1008px / 14 / 24 geometry).

    ``mesh`` with an ``sp`` axis > 1 enables SEQUENCE PARALLELISM — the
    single-image latency lever dp (more images) and tp (wider layers)
    cannot provide: the window axis (B*nw) is sharded over ``sp``, so the
    window scans run with ZERO communication (windows are independent),
    and the 4 global layers run q-sharded attention (each chip keeps its
    token shard as queries; XLA all-gathers K/V over ICI — the only
    collective in the trunk). Constraint: sp must divide B*nw, so at the
    canonical 1008 px geometry (3x3 = 9 windows) batch-1 wants sp in
    {3, 9}. Composes with tp (weights Megatron-sharded, activations
    sp-sharded). The trunk output is gathered before the neck — at ViT-H
    scale a single ~13 MB all-gather against ~50 ms of trunk compute.
    """
    sp_shard = tok_shard = gather = None
    if mesh is not None and dict(mesh.shape).get("sp", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sp_shard = NamedSharding(mesh, P("sp", None, None))
        tok_shard = NamedSharding(mesh, P(None, "sp", None))
        gather = NamedSharding(mesh, P())

    x = vision_embed(p["embeddings"], image, vp.patch_size)
    x = layer_norm(p["layer_norm"], x)
    b, hp, wp, c = x.shape
    win = vp.window_size
    assert hp % win == 0 and wp % win == 0, (hp, wp, win)
    nwh, nww = hp // win, wp // win
    nw = nwh * nww

    # one transpose in: (B, hp, wp, C) -> window-major (B*nw, win*win, C)
    x = x.reshape(b, nwh, win, nww, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b * nw, win * win, c)
    if sp_shard is not None:
        sp_size = dict(mesh.shape)["sp"]
        if (b * nw) % sp_size:
            raise ValueError(
                f"sequence parallelism needs sp ({sp_size}) to divide batch*windows "
                f"({b}*{nw}); at the canonical 1008 px geometry (9 windows, batch 1) "
                "use sp in {3, 9} — on a power-of-2 slice build a sub-mesh, e.g. "
                "make_mesh(6, tp=2, sp=3) on 8 chips (the rest stay idle or serve dp)"
            )
        x = jax.lax.with_sharding_constraint(x, sp_shard)

    # rope tables: window layers use in-window positions (standard tables);
    # global layers use full-grid positions permuted to window-major order
    scale_global = float(win) / float(vp.image_size // vp.patch_size)
    ii, jj, rr, ss = np.meshgrid(
        np.arange(nwh), np.arange(nww), np.arange(win), np.arange(win), indexing="ij"
    )
    px = ((jj * win + ss).reshape(-1)).astype(np.float64) * scale_global
    py = ((ii * win + rr).reshape(-1)).astype(np.float64) * scale_global
    hd = c // vp.n_heads
    glb_tables = _rope_tables_pos(px, py, hd)

    def win_body(carry, wslice):
        y = _vision_layer_tokens(Params(wslice), carry, vp.n_heads, win, 1.0)
        return y, None

    for kind, a, n in sam3_window_runs(vp):
        if kind == "win":
            run = {k: v[a : a + n] for k, v in win_stack.items()}
            x, _ = jax.lax.scan(win_body, x, run)
        else:
            t = x.reshape(b, nw * win * win, c)
            if tok_shard is not None:
                # q-sharded global attention: tokens stay sp-sharded; XLA
                # gathers K/V (attention is permutation-invariant, and the
                # window-major shard boundaries align with window groups)
                t = jax.lax.with_sharding_constraint(t, tok_shard)
            # flash routes to the pallas kernel, which has no SPMD
            # partitioning rule — under sp it would force XLA to gather and
            # replicate the whole sequence on every chip. The XLA einsum
            # attention partitions cleanly (q stays sharded), so it is the
            # right kernel for the sp path.
            t = _vision_layer_tokens(
                p["layers"][a], t, vp.n_heads, 0, 0.0,
                flash=flash and tok_shard is None, tables=glb_tables,
            )
            x = t.reshape(b * nw, win * win, c)
            if sp_shard is not None:
                x = jax.lax.with_sharding_constraint(x, sp_shard)

    # one transpose out: window-major -> (B, hp, wp, C)
    x = x.reshape(b, nwh, nww, win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)
    if gather is not None:
        # gather the trunk output once so the (tiny) FPN neck runs
        # replicated — one all-gather instead of halo-exchange plumbing
        x = jax.lax.with_sharding_constraint(x, gather)
    return x


def _sam3_stage_layout(vp: Sam3VitParams, pp_size: int):
    """Validate the trunk decomposes into pp-shardable uniform stages;
    returns (n_stages, stages_per_chip, window_layers_per_stage,
    global_layer_indexes)."""
    runs = sam3_window_runs(vp)
    wins = [r for r in runs if r[0] == "win"]
    glbs = [r[1] for r in runs if r[0] == "glb"]
    if not (
        wins
        and len(wins) == len(glbs)
        and all(r[2] == wins[0][2] for r in wins)
        and [k for k, _, _ in runs] == ["win", "glb"] * len(glbs)
    ):
        raise ValueError(f"trunk is not uniform (win^k glb)* stages: {runs}")
    n_stages = len(glbs)
    if n_stages % pp_size:
        raise ValueError(f"{n_stages} stages not divisible by mesh pp={pp_size}")
    return n_stages, n_stages // pp_size, wins[0][2], glbs


def sam3_pipeline_weights(
    p: Params, win_stack: dict, vp: Sam3VitParams, mesh
) -> dict:
    """EAGERLY build + place the stage-stacked trunk weights for the
    pipeline path: win (pp, s_per, per, ...), glb (pp, s_per, ...), each
    leaf device_put with its leading stage axis sharded over ``pp``
    (parallel.pipeline.stage_sharding) — so every chip materializes ONLY
    its own n_stages/pp stages' weights. This placement is what makes pp
    actually scale trunks larger than one chip's HBM; building the stacks
    inside the jitted program instead leaves the replicated copy's
    footprint to the compiler's discretion. ``p``: the backbone Params
    view (dotted ``layers.{i}`` weights for the globals)."""
    from ..parallel.pipeline import stage_sharding

    pp_size = dict(mesh.shape)["pp"]
    _, s_per, per, glbs = _sam3_stage_layout(vp, pp_size)
    sh = stage_sharding(mesh)
    out_win = {
        k: jax.device_put(
            jnp.reshape(v, (pp_size, s_per, per) + tuple(v.shape[1:])), sh
        )
        for k, v in win_stack.items()
    }
    out_glb = {}
    for leaf in _SAM3_LAYER_LEAVES:
        arr = jnp.stack([p["layers"][gi].weight(leaf) for gi in glbs])
        out_glb[leaf] = jax.device_put(
            jnp.reshape(arr, (pp_size, s_per) + tuple(arr.shape[1:])), sh
        )
    return {"win": out_win, "glb": out_glb}


def vision_transformer_pp(
    p: Params,
    win_stack: dict | None,
    images,
    vp: Sam3VitParams,
    mesh,
    flash: bool = False,
    stage_weights: dict | None = None,
):
    """PIPELINE-PARALLEL trunk: GPipe over the scan trunk's uniform stages.

    The trunk decomposes into n_stages identical stages of (``per`` window
    layers + 1 global layer) — 4 x (7 + 1) at ViT-H scale
    (sam3_window_runs). With a mesh ``pp`` axis, each chip holds
    n_stages/pp stages' weights (parallel.pipeline.pipeline_apply) and the
    image batch flows through as microbatches, one ~13 MB activation
    ppermute per stage step. This is the axis that scales trunks LARGER
    than one chip's HBM; prefer dp when the weights fit (no pipeline
    bubble — b images fill b + pp - 1 steps here). Exact same math as
    vision_transformer_scan; embed and the (tiny) neck run replicated.

    Pass ``stage_weights`` from :func:`sam3_pipeline_weights` so each chip
    holds only its stages (the HBM-scaling contract); with only
    ``win_stack``, the stacks are built inside the program — convenient,
    but the pre-slice footprint is left to the compiler. Reference graph:
    src/visp/arch/sam3.h:291-613 (single device).
    """
    pp_size = dict(mesh.shape)["pp"]
    n_stages, s_per, per, glbs = _sam3_stage_layout(vp, pp_size)

    from ..parallel.pipeline import pipeline_apply

    x = vision_embed(p["embeddings"], images, vp.patch_size)
    x = layer_norm(p["layer_norm"], x)
    b, hp, wp, c = x.shape
    win = vp.window_size
    assert hp % win == 0 and wp % win == 0, (hp, wp, win)
    nwh, nww = hp // win, wp // win
    nw = nwh * nww
    tok = win * win

    x = x.reshape(b, nwh, win, nww, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, nw, tok, c)

    scale_global = float(win) / float(vp.image_size // vp.patch_size)
    ii, jj, rr, ss = np.meshgrid(
        np.arange(nwh), np.arange(nww), np.arange(win), np.arange(win), indexing="ij"
    )
    px = ((jj * win + ss).reshape(-1)).astype(np.float64) * scale_global
    py = ((ii * win + rr).reshape(-1)).astype(np.float64) * scale_global
    glb_tables = _rope_tables_pos(px, py, c // vp.n_heads)

    # stage-stacked weights: win (pp, s_per, per, ...), glb (pp, s_per, ...)
    if stage_weights is not None:
        lead = {tuple(jnp.shape(v))[:1] for t in stage_weights.values() for v in t.values()}
        if lead != {(pp_size,)}:
            raise ValueError(f"stage_weights leading dims {lead} != mesh pp {pp_size}")
        win_w, glb_w = stage_weights["win"], stage_weights["glb"]
    else:
        if win_stack is None:
            raise ValueError("vision_transformer_pp needs stage_weights or win_stack")
        win_w = {
            k: v.reshape((pp_size, s_per, per) + v.shape[1:]) for k, v in win_stack.items()
        }
        glb_w = {}
        for leaf in _SAM3_LAYER_LEAVES:
            arr = jnp.stack([p["layers"][gi].weight(leaf) for gi in glbs])
            glb_w[leaf] = arr.reshape((pp_size, s_per) + arr.shape[1:])

    def win_body(carry, wslice):
        return _vision_layer_tokens(Params(wslice), carry, vp.n_heads, win, 1.0), None

    def one_stage(xx, ws):
        xx, _ = jax.lax.scan(win_body, xx, ws["win"])
        t = xx.reshape(1, nw * tok, c)
        t = _vision_layer_tokens(
            Params(ws["glb"]), t, vp.n_heads, 0, 0.0, flash=flash, tables=glb_tables
        )
        return t.reshape(nw, tok, c), None

    def stage_fn(w, xx):
        xx, _ = jax.lax.scan(one_stage, xx, w)
        return xx

    x = pipeline_apply(stage_fn, {"win": win_w, "glb": glb_w}, x, mesh)

    x = x.reshape(b, nwh, nww, win, win, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)


def encode_vision_pipelined(
    p: Params,
    images,
    vp: Sam3VitParams = Sam3VitParams(),
    flash: bool = False,
    win_stack: dict | None = None,
    mesh=None,
    stage_weights: dict | None = None,
) -> VisionOutput:
    """Batched encode_vision with the trunk pipeline-parallel over the
    mesh's ``pp`` axis (see vision_transformer_pp). ``images``: (B, H, W, 3);
    B is the microbatch count — B >= pp keeps the bubble small. For the
    HBM-scaling contract (each chip holds only its stages' weights), pass
    ``stage_weights`` built once with :func:`sam3_pipeline_weights`."""
    if mesh is None or (win_stack is None and stage_weights is None):
        raise ValueError(
            "encode_vision_pipelined needs a mesh with a pp axis and "
            "stage_weights (sam3_pipeline_weights) or win_stack"
        )
    x = vision_transformer_pp(
        p["backbone"], win_stack, images, vp, mesh, flash=flash, stage_weights=stage_weights
    )
    return vision_neck(p["neck"], x)


# ---------------------------------------------------------------------------
# FPN neck (reference sam3.h:517-613)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def sine_position_embedding(width: int, height: int, n_pos_feats: int, normalize: bool = True):
    """(reference sine_position_embedding, sam3.h:524-563).
    Returns (height, width, 2*n_pos_feats) f32: y features then x features."""
    temperature, scale, eps = 10000.0, 2.0 * math.pi, 1e-6
    k = np.arange(n_pos_feats)
    dim_t = temperature ** (2.0 * (k // 2) / n_pos_feats)
    y = np.arange(1, height + 1, dtype=np.float64)
    x = np.arange(1, width + 1, dtype=np.float64)
    if normalize:
        y = y / (height + eps) * scale
        x = x / (width + eps) * scale
    yv = y[:, None] / dim_t[None, :]  # (H, F)
    xv = x[:, None] / dim_t[None, :]  # (W, F)
    y_feat = np.where(k % 2 == 0, np.sin(yv), np.cos(yv))  # (H, F)
    x_feat = np.where(k % 2 == 0, np.sin(xv), np.cos(xv))  # (W, F)
    out = np.empty((height, width, 2 * n_pos_feats), np.float32)
    out[:, :, :n_pos_feats] = y_feat[:, None, :]
    out[:, :, n_pos_feats:] = x_feat[None, :, :]
    return out


def fpn_layer(p: Params, x, index: int):
    """(reference fpn_layer, sam3.h:566-587)."""
    if index == 0:
        x = conv_transpose_2d(p["scale_layers"][0], x, 2)
        x = gelu(x)
        x = conv_transpose_2d(p["scale_layers"][2], x, 2)
    elif index == 1:
        x = conv_transpose_2d(p["scale_layers"][0], x, 2)
    elif index == 3:
        x = max_pool_2d(x, 2, 2)
    x = conv_2d(p["proj1"], x, 1, 0)
    x = conv_2d(p["proj2"], x, 1, 1)
    return x


class VisionOutput(NamedTuple):
    fpn_hidden_states: list
    fpn_position_encoding: list


def vision_neck(p: Params, x) -> VisionOutput:
    """(reference vision_neck, sam3.h:589-602). x: (B, h, w, C)."""
    hidden, pe = [], []
    for i in range(4):
        h = fpn_layer(p["fpn_layers"][i], x, i)
        hidden.append(h)
        pe.append(jnp.asarray(sine_position_embedding(h.shape[2], h.shape[1], h.shape[3] // 2)))
    return VisionOutput(hidden, pe)


def encode_vision(
    p: Params,
    image,
    vp: Sam3VitParams = Sam3VitParams(),
    flash: bool = False,
    win_stack: dict | None = None,
    mesh=None,
) -> VisionOutput:
    """(reference encode_vision, sam3.h:604-613). With ``win_stack`` (from
    sam3_pack_vision_weights) and a window-divisible patch grid, the trunk
    runs the fused window-major scan path. ``mesh`` with an ``sp`` axis > 1
    runs the trunk sequence-parallel (see vision_transformer_scan);
    requires the scan path."""
    hp = image.shape[1] // vp.patch_size
    wp = image.shape[2] // vp.patch_size
    if win_stack is not None and hp % vp.window_size == 0 and wp % vp.window_size == 0:
        x = vision_transformer_scan(p["backbone"], win_stack, image, vp, flash=flash, mesh=mesh)
    else:
        if mesh is not None and dict(mesh.shape).get("sp", 1) > 1:
            raise ValueError(
                "sequence parallelism (mesh sp axis) requires the scan trunk: "
                "pass win_stack and a window-divisible patch grid"
            )
        x = vision_transformer(p["backbone"], image, vp, flash=flash)
    return vision_neck(p["neck"], x)


def sam3_process_input(img: Image, image_size: int = 1008) -> np.ndarray:
    """Resize to the model's square input, map to [-1, 1] (sam3.h:619-622)."""
    resized = image_scale(img, (image_size, image_size), preprocess_scale_method())
    out = image_u8_to_f32(resized, ImageFormat.rgb_f32, offset=(-0.5,) * 4, scale=(2.0,) * 4)
    return out.data


@lru_cache(maxsize=8)
def _sam3_programs(vp: Sam3VitParams, flash: bool, n_text: int, mesh=None):
    """Jitted text/vision executables shared across model instances.
    ``mesh`` is only passed (and only keys the cache) when it carries an
    sp axis > 1 — the sequence-parallel trunk needs it for its sharding
    constraints; dp/tp placement needs no program-side cooperation."""

    @jax.jit
    def text_fn(weights, ids, mask):
        return encode_text(Params(weights)["det"], ids, mask, n_layers=n_text)

    @jax.jit
    def vision_fn(weights, win_stack, image):
        out = encode_vision(
            Params(weights)["det.ve"], image, vp, flash=flash, win_stack=win_stack, mesh=mesh
        )
        return tuple(out.fpn_hidden_states)

    return text_fn, vision_fn


class Sam3Model:
    """High-level handle for the WIP SAM3 scope: tokenizer + text encoder +
    vision encoder/neck (no mask decoder yet, matching the reference)."""

    def __init__(
        self,
        params: dict,
        tokenizer: ClipTokenizer,
        max_tokens: int,
        device,
        vp: Sam3VitParams | None = None,
        mesh=None,
    ):
        from ..core.weights import cast_float_params

        self.params = cast_float_params(params, device.preferred_float_type)
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.device = device
        self.mesh = mesh
        import jax

        from ..core.device import BuildFlag

        flash = bool(device.flags & BuildFlag.flash_attention)
        vp = vp or Sam3VitParams()

        # text depth from the weights, not hardcoded (reduced checkpoints)
        n_text = 0
        while any(k.startswith(f"det.te.text_model.encoder.layers.{n_text}.") for k in params):
            n_text += 1

        act_mesh = (
            mesh if mesh is not None and dict(mesh.shape).get("sp", 1) > 1 else None
        )
        self._text_fn, self._vision_fn = _sam3_programs(vp, flash, n_text, act_mesh)
        self._vp = vp
        self._win_stack = None

    def _vision_stack(self):
        if self._win_stack is None:
            stack = sam3_pack_vision_weights(self.params, self._vp, prefix="det.ve.backbone.")
            # the scan trunk reads window-layer weights ONLY from the stack;
            # keeping the flat per-layer copies resident would double ~1 GB
            # of ViT-H trunk HBM. Rebind self.params to a view WITHOUT them
            # (a copy, never a mutation — the constructor's dict belongs to
            # the caller) when the model's fixed geometry guarantees the
            # scan path (encode_vision falls back to the flat trunk only
            # for non-window-divisible grids, which sam3_process_input's
            # square resize rules out here). sam3_load_model drops its own
            # reference, so the flat window weights' HBM is then freed —
            # and the mesh placement below never uploads them.
            vp = self._vp
            if (vp.image_size // vp.patch_size) % vp.window_size == 0:
                dropped = {
                    f"det.ve.backbone.layers.{i}.{leaf}"
                    for i in range(vp.n_layers)
                    if i not in vp.global_attn_indexes
                    for leaf in _SAM3_LAYER_LEAVES
                }
                self.params = {k: v for k, v in self.params.items() if k not in dropped}
            if self.mesh is not None:
                self.params, stack = sam3_shard_vision(self.params, stack, self.mesh)
            self._win_stack = stack
        return self._win_stack

    def encode_text(self, text: str):
        toks = self.tokenizer.tokenize(text, self.max_tokens)
        import jax.numpy as jnp

        return self._text_fn(
            self.params, jnp.asarray(toks.token_ids[None]), jnp.asarray(toks.attention_mask)
        )

    def encode_vision(self, image: Image):
        import jax.numpy as jnp

        x = sam3_process_input(image, self._vp.image_size)
        return self._vision_fn(
            self.params, self._vision_stack(), jnp.asarray(x[None], self.device.preferred_float_type)
        )


def sam3_load_model(filepath: str, device=None, mesh=None) -> Sam3Model:
    """``mesh``: a (dp[, sp], tp) jax.sharding.Mesh — weights are tp-sharded
    at first vision use (sam3_shard_vision); an ``sp`` axis > 1 additionally
    runs the trunk sequence-parallel (single-image latency scaling; sp must
    divide the window count — 9 at the canonical 1008 px geometry, so
    sp in {3, 9}). Quantized files always expand
    here (no keep_quantized path): the
    scan trunk consumes the stacked window weights as lax.scan xs, and a
    whole-stack in-graph dequant measured 117 vs 70 ms on v5e
    (NOTES.md quantized-residency findings)."""
    import jax
    import jax.numpy as jnp

    from ..core.device import backend_init
    from ..core.gguf import model_load
    from ..core.weights import load_weights

    device = device or backend_init()
    file = model_load(filepath)
    tokenizer = clip_tokenizer_init(file)
    max_tokens = file.get_int("sam3.tokenizer.max_length", 32)
    raw = load_weights(file, device=None, as_numpy=True)
    dtype = device.preferred_float_type
    params = {}
    for k, v in raw.items():
        a = v if mesh is not None else jax.device_put(v, device.jax_device)
        if np.issubdtype(np.asarray(v).dtype, np.floating):
            a = np.asarray(a, dtype) if mesh is not None else a.astype(dtype)
        params[k] = a
    return Sam3Model(params, tokenizer, max_tokens, device, mesh=mesh)
