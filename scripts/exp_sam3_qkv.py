#!/usr/bin/env python
"""SAM3 residual ~8 ms probe (VERDICT r3 next #3).

The scan trunk measures ~70 ms vs ~62 ms sum-of-parts; exp_sam3_unroll
proved control flow is a wash, so the residual is weight residency /
composition. Two probes:

  ab        — fused QKV projection: pre-concatenate q/k/v (and their
              biases) into one (3C, C) GEMM per layer, in the scan stack
              and the 4 global layers. One weight block streams instead of
              three, and x is read once instead of three times. Math is
              bit-identical (GEMM rows are independent).
  segments  — cumulative partial-trunk loop timings (embed -> +run1 ->
              +glb1 -> ... -> +neck): consecutive differences localize
              which boundary carries the in-context overhead.

Usage: python scripts/exp_sam3_qkv.py [ab|segments|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from vision_tpu.benchmark import _loop_time, _u8
from vision_tpu.core.device import backend_init
from vision_tpu.core.params import Params
from vision_tpu.models import sam3 as S
from vision_tpu.models.random_weights import random_sam3_vision_params
from vision_tpu.ops.nn import attention, layer_norm, linear

import math

# EXP_TINY=1: reduced geometry for CPU parity validation of the fused-QKV
# math before spending a TPU session (mirrors tests/test_parallel.py:188).
TINY = os.environ.get("EXP_TINY") == "1"
if TINY:  # run the parity check on CPU without touching the tunnel
    jax.config.update("jax_platforms", "cpu")
dev = backend_init()
dtype = dev.preferred_float_type
if TINY:
    vp = S.Sam3VitParams(
        image_size=32, patch_size=4, window_size=4, n_layers=4, n_heads=4,
        global_attn_indexes=(1, 3),
    )
    raw = dict(random_sam3_vision_params(dim=64, layers=4))
    raw["backbone.embeddings.patch_embeddings.projection.weight"] = (
        np.random.default_rng(17).standard_normal((64, 3, 4, 4)).astype(np.float32) * 0.05
    )
    IMG = (1, 32, 32, 3)
else:
    vp = S.Sam3VitParams()
    raw = random_sam3_vision_params()
    IMG = (1, 1008, 1008, 3)
params = {}
for k, v in raw.items():
    a = jax.device_put(v, dev.jax_device)
    if v.dtype == np.float32 and "position_embeddings" not in k:
        a = a.astype(dtype)
    params[k] = a
stack = S.sam3_pack_vision_weights(params, vp)
jax.block_until_ready(stack)


@jax.jit
def _fuse_stack(ws):
    out = {k: v for k, v in ws.items() if "q_proj" not in k and "k_proj" not in k and "v_proj" not in k}
    out["attention.qkv.weight"] = jnp.concatenate(
        [ws["attention.q_proj.weight"], ws["attention.k_proj.weight"], ws["attention.v_proj.weight"]],
        axis=1,  # (L, out, in) -> (L, 3*out, in)
    )
    out["attention.qkv.bias"] = jnp.concatenate(
        [ws["attention.q_proj.bias"], ws["attention.k_proj.bias"], ws["attention.v_proj.bias"]],
        axis=1,
    )
    return out


def _fuse_global(pp: dict, prefix: str) -> dict:
    out = dict(pp)
    out[f"{prefix}.attention.qkv.weight"] = jnp.concatenate(
        [pp[f"{prefix}.attention.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")], axis=0
    )
    out[f"{prefix}.attention.qkv.bias"] = jnp.concatenate(
        [pp[f"{prefix}.attention.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj")], axis=0
    )
    return out


def rope_attention_fused(p, x, n_heads, n_rows, scale, flash=False, tables=None):
    """rope_attention with ONE fused qkv GEMM (otherwise identical math)."""
    b, t, c = x.shape
    hd = c // n_heads
    y3 = linear(p["qkv"], x)  # (B, T, 3C)
    q, k, v = jnp.split(y3, 3, axis=-1)

    if flash:
        def heads(z):
            return jnp.transpose(z.reshape(b, t, n_heads, hd), (0, 2, 1, 3))

        q, k, v = heads(q), heads(k), heads(v)
        if tables is None:
            q = S.apply_rope_2d(q, n_rows, scale)
            k = S.apply_rope_2d(k, n_rows, scale)
        else:
            q = S._apply_rope_tables(q, tables, "bhtd")
            k = S._apply_rope_tables(k, tables, "bhtd")
        return attention(p["o_proj"], q, k, v, None, 1.0 / math.sqrt(hd), flash=flash)

    q = q.reshape(b, t, n_heads, hd)
    k = k.reshape(b, t, n_heads, hd)
    v = v.reshape(b, t, n_heads, hd)
    if tables is None:
        q = S.apply_rope_2d(q, n_rows, scale, layout="bthd")
        k = S.apply_rope_2d(k, n_rows, scale, layout="bthd")
    else:
        q = S._apply_rope_tables(q, tables, "bthd")
        k = S._apply_rope_tables(k, tables, "bthd")
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(1.0 / math.sqrt(hd), x.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
    return linear(p["o_proj"], y)


def _layer_tokens_fused(p, x, n_heads, n_rows, scale, flash=False, tables=None):
    res = x
    y = layer_norm(p["layer_norm1"], x)
    y = rope_attention_fused(p["attention"], y, n_heads, n_rows, scale, flash=flash, tables=tables)
    x = res + y
    return x + S.vision_mlp(p["mlp"], layer_norm(p["layer_norm2"], x))


def _trunk_prelude(pp, image):
    x = S.vision_embed(pp["embeddings"], image, vp.patch_size)
    x = layer_norm(pp["layer_norm"], x)
    b, hp, wp, c = x.shape
    win = vp.window_size
    nwh, nww = hp // win, wp // win
    nw = nwh * nww
    x = x.reshape(b, nwh, win, nww, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b * nw, win * win, c)
    scale_global = float(win) / float(vp.image_size // vp.patch_size)
    ii, jj, rr, ss = np.meshgrid(
        np.arange(nwh), np.arange(nww), np.arange(win), np.arange(win), indexing="ij"
    )
    px = ((jj * win + ss).reshape(-1)).astype(np.float64) * scale_global
    py = ((ii * win + rr).reshape(-1)).astype(np.float64) * scale_global
    tables = S._rope_tables_pos(px, py, c // vp.n_heads)
    return x, (b, nwh, nww, win, nw, c), tables


def vt_scan_fused(pp, fused_stack, image, flash=True):
    x, (b, nwh, nww, win, nw, c), glb_tables = _trunk_prelude(pp, image)

    def win_body(carry, wslice):
        return _layer_tokens_fused(Params(wslice), carry, vp.n_heads, win, 1.0), None

    for kind, a, n in S.sam3_window_runs(vp):
        if kind == "win":
            run = {k: v[a : a + n] for k, v in fused_stack.items()}
            x, _ = jax.lax.scan(win_body, x, run)
        else:
            t = x.reshape(b, nw * win * win, c)
            t = _layer_tokens_fused(
                pp[f"layers_fused.{a}"], t, vp.n_heads, 0, 0.0, flash=flash, tables=glb_tables
            )
            x = t.reshape(b * nw, win * win, c)
    x = x.reshape(b, nwh, nww, win, win, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, nwh * win, nww * win, c)


def make_fused_params():
    """params + fused global-layer weights under 'backbone.layers_fused.N.'"""
    out = dict(params)
    for i in vp.global_attn_indexes:
        pre = f"backbone.layers.{i}"
        fused = _fuse_global(
            {k: v for k, v in params.items() if k.startswith(pre + ".attention.")}, pre
        )
        for name in ("weight", "bias"):
            out[f"backbone.layers_fused.{i}.attention.qkv.{name}"] = fused[
                f"{pre}.attention.qkv.{name}"
            ]
        # non-attention leaves + o_proj stay shared via aliasing
        for k, v in params.items():
            if k.startswith(pre + "."):
                out[k.replace(f"layers.{i}", f"layers_fused.{i}")] = v
    return out


def step_scan(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    out = S.encode_vision(Params(w["p"]), img, vp, flash=True, win_stack=w["s"])
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


def step_fused(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    x = vt_scan_fused(Params(w["p"])["backbone"], w["s"], img, flash=True)
    out = S.vision_neck(Params(w["p"])["neck"], x)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


def run_ab():
    fstack = dict(_fuse_stack(stack))
    fparams = make_fused_params()
    jax.block_until_ready(fstack)
    x = _u8(IMG)
    # parity first (cheap shapes won't divide into windows; compare sums)
    a = float(step_scan({"p": params, "s": stack}, x))
    b = float(step_fused({"p": fparams, "s": fstack}, x))
    rel = abs(a - b) / max(abs(a), 1e-9)
    print(f"parity: scan={a:.6g} fused={b:.6g} rel={rel:.2e}", flush=True)
    K = 8
    t0 = time.time()
    m1, s1, _ = _loop_time(step_scan, {"p": params, "s": stack}, x, k=K, repeats=3)
    print(f"baseline scan: {m1:7.1f} ms/iter (stdev {s1:.1f}) [{time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    m2, s2, _ = _loop_time(step_fused, {"p": fparams, "s": fstack}, x, k=K, repeats=3)
    print(f"fused qkv:     {m2:7.1f} ms/iter (stdev {s2:.1f}) [{time.time()-t0:.0f}s]", flush=True)


def run_segments():
    """Cumulative partial trunks; consecutive diffs = per-segment cost."""
    runs = S.sam3_window_runs(vp)
    x_in = _u8(IMG)

    def make_step(n_segments, with_neck=False):
        def step(w, xx):
            img = xx.astype(dtype) / 127.5 - 1.0
            pp = Params(w["p"])["backbone"]
            x, (b, nwh, nww, win, nw, c), glb_tables = _trunk_prelude(pp, img)

            def win_body(carry, wslice):
                return S._vision_layer_tokens(Params(wslice), carry, vp.n_heads, win, 1.0), None

            for kind, a, n in runs[:n_segments]:
                if kind == "win":
                    run = {k: v[a : a + n] for k, v in w["s"].items()}
                    x, _ = jax.lax.scan(win_body, x, run)
                else:
                    t = x.reshape(b, nw * win * win, c)
                    t = S._vision_layer_tokens(
                        pp["layers"][a], t, vp.n_heads, 0, 0.0, flash=True, tables=glb_tables
                    )
                    x = t.reshape(b * nw, win * win, c)
            if with_neck:
                x = x.reshape(b, nwh, nww, win, win, c)
                x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, nwh * win, nww * win, c)
                out = S.vision_neck(Params(w["p"])["neck"], x)
                return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)
            return jnp.sum(x.astype(jnp.float32))

        return step

    w = {"p": params, "s": stack}
    prev = 0.0
    labels = ["embed+in"] + [f"{k}{a}" for k, a, n in runs] + ["neck"]
    for i in range(len(runs) + 2):
        if i <= len(runs):
            step = make_step(i, with_neck=False)
        else:
            step = make_step(len(runs), with_neck=True)
        m, s, _ = _loop_time(step, w, x_in, k=6, repeats=2)
        print(f"cum[{i:2d}] {labels[i] if i < len(labels) else '?':10s} "
              f"{m:7.2f} ms  (+{m - prev:6.2f})  stdev {s:.2f}", flush=True)
        prev = m


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("ab", "both"):
        run_ab()
    if mode in ("segments", "both"):
        run_segments()
