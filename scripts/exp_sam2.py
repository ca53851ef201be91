#!/usr/bin/env python
"""Component-level timing inside TinyViT stage1 (the 6.7 ms of the 20.4 ms
batch-4 SAM encode). Isolates window partition/reverse, attention, local
conv, and MLP to find the dominant cost."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import (
    TinyVitParams,
    attention_rel_bias,
    basic_layer,
    mlp,
    tiny_vit_block,
    window_partition,
    window_reverse,
)
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops import conv_2d_depthwise

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
dtype = jnp.bfloat16
tp = TinyVitParams()
LP = tp.layers[1]  # stage1: res 128, dim 128, depth 2, heads 4, window 7

raw = random_mobile_sam_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}

key = jax.random.PRNGKey(0)


def dev_normal(shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


def blk(p):
    return p["enc"]["layers"][1]["blocks"][0]


T = LP.resolution * LP.resolution
C = LP.embed_dim
W = LP.window_size

STAGES = {
    # the full stage (both blocks + downsample) for reference
    "stage1_full": (lambda p, x: basic_layer(p["enc"]["layers"][1], x, LP), (B, T, C)),
    # one block
    "block": (
        lambda p, x: tiny_vit_block(blk(p), x, LP.resolution, C, LP.num_heads, W),
        (B, T, C),
    ),
    # window partition + reverse only (identity middle)
    "win_part+rev": (
        lambda p, x: window_reverse(
            window_partition(x.reshape(B, LP.resolution, LP.resolution, C), W) * 1.000001,
            LP.resolution, LP.resolution, W,
        ).reshape(B, T, C),
        (B, T, C),
    ),
    # attention on pre-windowed tokens (no partition cost)
    "attn_windowed": (
        lambda p, x: attention_rel_bias(blk(p)["attn"], x, C, LP.num_heads),
        (B * 19 * 19, W * W, C),
    ),
    # local depthwise conv
    "local_conv": (
        lambda p, x: conv_2d_depthwise(blk(p)["local_conv"]["c"], x, 1, 1),
        (B, LP.resolution, LP.resolution, C),
    ),
    # MLP
    "mlp": (lambda p, x: mlp(blk(p)["mlp"], x), (B, T, C)),
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


print(f"device: {dev}, batch {B}", flush=True)
for name, (fn, shape) in STAGES.items():
    t = timeit(fn, dev_normal(shape)) * 1000
    print(f"{name}: {t:7.3f} ms", flush=True)
