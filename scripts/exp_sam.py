#!/usr/bin/env python
"""Per-stage timing of the MobileSAM TinyViT encoder at batch 4 (the
headline workload) — find where the 20.4 ms/iter goes."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import (
    TinyVitParams,
    basic_layer,
    conv_layer,
    patch_embed,
    sam_encode_image,
    tiny_vit,
)
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops import conv_2d, layer_norm

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
dtype = jnp.bfloat16
tp = TinyVitParams()

raw = random_mobile_sam_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}
enc = Params(params)["enc"]

key = jax.random.PRNGKey(0)


def dev_normal(shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


def neck(p, x):
    b, t, c = x.shape
    res = tp.layers[-1].resolution
    x = x.reshape(b, res, res, c)
    x = conv_2d(p["neck"][0], x)
    x = layer_norm(p["neck"][1], x)
    x = conv_2d(p["neck"][2], x, 1, 1)
    return layer_norm(p["neck"][3], x)


STAGES = {
    "patch_embed@1024": (lambda p, x: patch_embed(p["patch_embed"], x), (B, 1024, 1024, 3)),
    "stage0_conv@256": (lambda p, x: conv_layer(p["layers"][0], x, tp.layers[0]), (B, 256, 256, 64)),
    "stage1_attn@128": (lambda p, x: basic_layer(p["layers"][1], x, tp.layers[1]), (B, 128 * 128, 128)),
    "stage2_attn@64": (lambda p, x: basic_layer(p["layers"][2], x, tp.layers[2]), (B, 64 * 64, 160)),
    "stage3_attn@64": (lambda p, x: basic_layer(p["layers"][3], x, tp.layers[3]), (B, 64 * 64, 320)),
    "neck@64": (neck, (B, 64 * 64, 320)),
    "full": (lambda p, x: tiny_vit(p, x, tp), (B, 1024, 1024, 3)),
}


def timeit(fn, x, K=8):
    @partial(jax.jit, static_argnames=("kk",))
    def run(w, x, kk):
        def body(i, acc):
            xi = (x.astype(jnp.float32) + acc * 0).astype(x.dtype)
            return acc + jnp.sum(fn(Params(w)["enc"], xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(params, x, K)); float(run(params, x, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(params, x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


print(f"device: {dev}, batch {B}", flush=True)
total = 0.0
for name, (fn, shape) in STAGES.items():
    t = timeit(fn, dev_normal(shape)) * 1000
    if name != "full":
        total += t
    print(f"{name}: {t:7.2f} ms", flush=True)
print(f"sum of stages: {total:7.2f} ms", flush=True)
