#!/usr/bin/env python
"""Windowed-attention micro-variants at TinyViT stage1 geometry
(5776 windows x 49 tokens x 128 ch, 4 heads, hd 32, batch-4 SAM encode).
Baseline attn_windowed = 2.4 ms; find where it goes and what helps."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import attention_rel_bias
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops import layer_norm, linear, split_qkv

dtype = jnp.bfloat16
raw = random_mobile_sam_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}

key = jax.random.PRNGKey(0)
BW, T, C, H = 5776, 49, 128, 4
HD = C // H
SCALE = 1.0 / np.sqrt(32.0)


def blk(p):
    return p["enc"]["layers"][1]["blocks"][0]["attn"]


def dev_normal(shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


def linears_only(p, x):
    p = blk(p)
    x = layer_norm(p["norm"], x)
    q, k, v = split_qkv(p["qkv"], x, H, split_dim=1)
    # identity "attention": pass v through
    x = jnp.transpose(v, (0, 2, 1, 3)).reshape(BW, T, C)
    return linear(p["proj"], x)


def core(p, x, f32_logits=True, softmax_f32=True):
    p = blk(p)
    mask = p.weight("attention_biases_indexed")[None]
    x = layer_norm(p["norm"], x)
    q, k, v = split_qkv(p["qkv"], x, H, split_dim=1)
    pet = jnp.float32 if f32_logits else None
    attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2), preferred_element_type=pet) * SCALE
    attn = attn + mask.astype(attn.dtype)
    if softmax_f32 and attn.dtype != jnp.float32:
        attn = attn.astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    o = jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(BW, T, C)
    return linear(p["proj"], o)


def padded64(p, x):
    """Pad window tokens 49 -> 64 before attention (aligned tiles)."""
    p = blk(p)
    mask = p.weight("attention_biases_indexed")  # (4, 49, 49)
    maskp = jnp.pad(mask, ((0, 0), (0, 15), (0, 15)), constant_values=-1e9)[None]
    x = layer_norm(p["norm"], x)
    q, k, v = split_qkv(p["qkv"], x, H, split_dim=1)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 15), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 15), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 15), (0, 0)))
    attn = jnp.matmul(qp, jnp.swapaxes(kp, -1, -2), preferred_element_type=jnp.float32) * SCALE
    attn = attn + maskp.astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    o = jnp.matmul(attn, vp, preferred_element_type=jnp.float32).astype(q.dtype)
    o = o[:, :, :T]
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(BW, T, C)
    return linear(p["proj"], o)


def merged_heads(p, x):
    """Heads merged into one (49,128)@(128,196) dot via block-diag K/V."""
    p = blk(p)
    mask = p.weight("attention_biases_indexed")  # (4,49,49)
    maskbd = jnp.transpose(mask, (1, 0, 2)).reshape(T, H * T)[None]
    x = layer_norm(p["norm"], x)
    q, k, v = split_qkv(p["qkv"], x, H, split_dim=1)  # (BW,H,T,hd)
    # q back to (BW, T, C) with heads on channels
    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(BW, T, C)
    # block-diag K^T: (BW, C, H*T) — head h occupies rows 32h:32h+32, cols 49h:...
    eye = jnp.asarray(np.eye(H, dtype=np.float32))
    kbd = jnp.einsum("bhtd,hg->bdght", k.astype(jnp.float32), eye).reshape(BW, HD * H, H * T)
    logits = jnp.matmul(qf.astype(jnp.float32), kbd.astype(qf.dtype), preferred_element_type=jnp.float32) * SCALE
    logits = logits + maskbd
    m = jnp.max(logits, axis=-1, keepdims=True)
    pm = jnp.exp(logits - m)
    # segment sums via matmul with (H*T, H) selector
    sel = jnp.asarray(np.repeat(np.eye(H, dtype=np.float32), T, axis=0))
    s = jnp.matmul(pm, sel)  # (BW, T, H)
    expand = jnp.asarray(np.repeat(np.eye(H, dtype=np.float32), HD, axis=1))
    denom = jnp.matmul(s, expand)  # (BW, T, C)
    vbd = jnp.einsum("bhtd,hg->bghtd", v.astype(jnp.float32), eye).reshape(BW, H * T, H * HD)
    o = jnp.matmul(pm.astype(q.dtype), vbd.astype(q.dtype), preferred_element_type=jnp.float32)
    o = (o / denom).astype(q.dtype)
    return linear(p["proj"], o)


VARIANTS = {
    "baseline": (lambda p, x: attention_rel_bias(blk(p).parent if hasattr(blk(p), 'parent') else Params(params)["enc"]["layers"][1]["blocks"][0]["attn"], x, C, H), (BW, T, C)),
    "linears_only": (linears_only, (BW, T, C)),
    "core_f32": (partial(core, f32_logits=True), (BW, T, C)),
    "core_bf16_logits": (partial(core, f32_logits=False, softmax_f32=False), (BW, T, C)),
    "core_bf16_sm32": (partial(core, f32_logits=False, softmax_f32=True), (BW, T, C)),
    "padded64": (padded64, (BW, T, C)),
    "merged_heads": (merged_heads, (BW, T, C)),
}


def timeit(fn, x, K=16):
    @partial(jax.jit, static_argnames=("kk",))
    def run(w, x, kk):
        def body(i, acc):
            xi = (x.astype(jnp.float32) + acc * 0).astype(x.dtype)
            return acc + jnp.sum(fn(Params(w), xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(params, x, K)); float(run(params, x, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(params, x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


# numeric check on CPU-sized sample first
xs = dev_normal((BW, T, C))
ref = np.asarray(core(Params(params), xs).astype(jnp.float32))
for nm in ("padded64", "merged_heads"):
    got = np.asarray(VARIANTS[nm][0](Params(params), xs).astype(jnp.float32))
    print(f"{nm} max|d|: {np.abs(got - ref).max():.5f}", flush=True)

print(f"device: {dev}", flush=True)
for name, (fn, shape) in VARIANTS.items():
    if name == "baseline":
        fn = lambda p, x: attention_rel_bias(p["enc"]["layers"][1]["blocks"][0]["attn"], x, C, H)
    t = timeit(fn, dev_normal(shape)) * 1000
    print(f"{name}: {t:7.3f} ms", flush=True)
