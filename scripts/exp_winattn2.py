#!/usr/bin/env python
"""Pallas window_attention vs XLA bf16-logit path at TinyViT stage
geometries (batch-4 SAM encode)."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.ops.pallas.window_attention import window_attention

key = jax.random.PRNGKey(0)
dtype = jnp.bfloat16

# (name, NW, T, H, hd) at batch 4
GEOMS = [
    ("stage1", 4 * 361, 49, 4, 32),
    ("stage2", 4 * 25, 196, 5, 32),
    ("stage3", 4 * 100, 49, 10, 32),
]


def timeit(fn, args, K=16):
    @partial(jax.jit, static_argnames=("kk",))
    def run(a, kk):
        def body(i, acc):
            a0 = (a[0].astype(jnp.float32) + acc * 0).astype(a[0].dtype)
            return acc + jnp.sum(fn(a0, *a[1:]).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(args, K)); float(run(args, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(args, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


def xla_path(q, k, v, bias, h, scale):
    nw, t, c = q.shape
    hd = c // h
    tr = lambda z: jnp.transpose(z.reshape(nw, t, h, hd), (0, 2, 1, 3))
    qh, kh, vh = tr(q), tr(k), tr(v)
    attn = jnp.matmul(qh, jnp.swapaxes(kh, -1, -2)) * jnp.asarray(scale, q.dtype)
    attn = attn + bias[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.matmul(attn, vh, preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(nw, t, c)


print(f"device: {jax.devices()[0]}", flush=True)
for name, nw, t, h, hd in GEOMS:
    c = h * hd
    scale = 1.0 / np.sqrt(hd)
    ks = jax.random.split(key, 4)
    q = (jax.random.normal(ks[0], (nw, t, c)) * 0.5).astype(dtype)
    k = (jax.random.normal(ks[1], (nw, t, c)) * 0.5).astype(dtype)
    v = (jax.random.normal(ks[2], (nw, t, c)) * 0.5).astype(dtype)
    bias = jax.random.normal(ks[3], (h, t, t)).astype(jnp.float32)

    # parity on device first
    a = np.asarray(xla_path(q, k, v, bias, h, scale).astype(jnp.float32))
    try:
        b = np.asarray(window_attention(q, k, v, bias, h, float(scale)).astype(jnp.float32))
        print(f"{name}: pallas max|d| {np.abs(a - b).max():.4f}", flush=True)
    except Exception as e:
        print(f"{name}: pallas FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue

    tx = timeit(lambda q_, k_, v_: xla_path(q_, k_, v_, bias, h, scale), (q, k, v)) * 1000
    tpk = timeit(lambda q_, k_, v_: window_attention(q_, k_, v_, bias, h, float(scale)), (q, k, v)) * 1000
    print(f"{name}: xla {tx:6.3f} ms   pallas {tpk:6.3f} ms", flush=True)
