#!/usr/bin/env python
"""Full windowed-attention BLOCK variants (LN + qkv + core + proj) at
TinyViT stage1 geometry, batch 4: hunting the ~1.2 ms of head-split/merge
glue around the 0.43 ms core."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops import layer_norm, linear, split_qkv
from vision_tpu.ops.pallas.window_attention import window_attention

dtype = jnp.bfloat16
raw = random_mobile_sam_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}
key = jax.random.PRNGKey(0)
NW, T, C, H = 1444, 49, 128, 4
HD = C // H
SCALE = 1.0 / np.sqrt(HD)


def blk(p):
    return p["enc"]["layers"][1]["blocks"][0]["attn"]


def dev_normal(shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


def full_current(p, x):
    p = blk(p)
    mask = p.weight("attention_biases_indexed")[None]
    x = layer_norm(p["norm"], x)
    q, k, v = split_qkv(p["qkv"], x, H, split_dim=1)
    attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2)) * jnp.asarray(SCALE, q.dtype)
    attn = attn + mask.astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(q.dtype)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(NW, T, C)
    return linear(p["proj"], o)


def full_einsum(p, x):
    """No explicit head transposes: einsum on (NW, T, H, hd) views."""
    p = blk(p)
    mask = p.weight("attention_biases_indexed")
    x = layer_norm(p["norm"], x)
    qkv = linear(p["qkv"], x).reshape(NW, T, H, 3, HD)
    q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # (NW,T,H,hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.asarray(SCALE, q.dtype)
    attn = attn + mask[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(NW, T, C)
    return linear(p["proj"], o)


def _split3(p):
    """Split the fused qkv weight into 3 (C, C) mats (free at pack time)."""
    w = p.weight("qkv.weight").reshape(H, 3, HD, C)
    b = p.weight("qkv.bias").reshape(H, 3, HD)
    ws = [w[:, i].reshape(C, C) for i in range(3)]
    bs = [b[:, i].reshape(C) for i in range(3)]
    return ws, bs


def full_3w(p, x):
    """Three separate linears emit q,k,v compact (NW,T,C); einsum core."""
    p = blk(p)
    mask = p.weight("attention_biases_indexed")
    (wq, wk, wv), (bq, bk, bv) = _split3(p)
    x = layer_norm(p["norm"], x)
    mm = lambda w, b: (jnp.matmul(x, w.T, preferred_element_type=jnp.float32) + b).astype(x.dtype)
    q, k, v = mm(wq, bq), mm(wk, bk), mm(wv, bv)
    qh = q.reshape(NW, T, H, HD)
    kh = k.reshape(NW, T, H, HD)
    vh = v.reshape(NW, T, H, HD)
    attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * jnp.asarray(SCALE, x.dtype)
    attn = attn + mask[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(NW, T, C)
    return linear(p["proj"], o)


def full_3w_pallas(p, x, g=16):
    p = blk(p)
    mask = p.weight("attention_biases_indexed").astype(jnp.float32)
    (wq, wk, wv), (bq, bk, bv) = _split3(p)
    x = layer_norm(p["norm"], x)
    mm = lambda w, b: (jnp.matmul(x, w.T, preferred_element_type=jnp.float32) + b).astype(x.dtype)
    q, k, v = mm(wq, bq), mm(wk, bk), mm(wv, bv)
    o = window_attention(q, k, v, mask, H, float(SCALE), g=g)
    return linear(p["proj"], o)


VARIANTS = {
    "full_current": full_current,
    "full_einsum": full_einsum,
    "full_3w": full_3w,
    "full_3w_pallas_g16": partial(full_3w_pallas, g=16),
    "full_3w_pallas_g64": partial(full_3w_pallas, g=64),
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


xs = dev_normal((NW, T, C))
ref = np.asarray(full_current(Params(params), xs).astype(jnp.float32))
for nm, fn in list(VARIANTS.items())[1:]:
    got = np.asarray(fn(Params(params), xs).astype(jnp.float32))
    print(f"{nm} max|d|: {np.abs(got - ref).max():.5f}", flush=True)

print(f"device: {dev}", flush=True)
for name, fn in VARIANTS.items():
    t = timeit(fn, dev_normal((NW, T, C))) * 1000
    print(f"{name}: {t:7.3f} ms", flush=True)
