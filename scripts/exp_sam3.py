#!/usr/bin/env python
"""SAM3 ViT-H per-part timing at 1008^2 (the 94 ms row): patch embed,
one window layer, one global layer (pallas flash), FPN neck."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.random_weights import random_sam3_vision_params
from vision_tpu.models.sam3 import (
    Sam3VitParams,
    encode_vision,
    vision_embed,
    vision_layer,
    vision_neck,
)

dtype = jnp.bfloat16
vp = Sam3VitParams()
raw = random_sam3_vision_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}
key = jax.random.PRNGKey(0)
HP = vp.image_size // vp.patch_size  # 72
C = 1280


def dev_normal(shape):
    return (jax.random.normal(key, shape, jnp.float32) * 0.5).astype(dtype)


def win_layer(p, x):
    return vision_layer(p["backbone"]["layers"][0], x, vp.window_size, vp.n_heads, vp.window_size, 1.0, flash=False)


def glob_layer_flash(p, x):
    sg = float(vp.window_size) / float(HP)
    return vision_layer(p["backbone"]["layers"][7], x, 0, vp.n_heads, HP, sg, flash=True)


def glob_layer_xla(p, x):
    sg = float(vp.window_size) / float(HP)
    return vision_layer(p["backbone"]["layers"][7], x, 0, vp.n_heads, HP, sg, flash=False)


STAGES = {
    "patch_embed": (lambda p, x: vision_embed(p["backbone"]["embeddings"], x, vp.patch_size), (1, 1008, 1008, 3)),
    "window_layer": (win_layer, (1, HP, HP, C)),
    "global_layer_flash": (glob_layer_flash, (1, HP, HP, C)),
    "global_layer_xla": (glob_layer_xla, (1, HP, HP, C)),
    "neck": (lambda p, x: jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in vision_neck(p["neck"], x).fpn_hidden_states]), (1, HP, HP, C)),
    "full": (lambda p, x: encode_vision(p, x, vp, flash=True).fpn_hidden_states[0], (1, 1008, 1008, 3)),
}


def timeit(fn, x, K=8):
    @partial(jax.jit, static_argnames=("kk",))
    def run(w, x, kk):
        def body(i, acc):
            xi = (x.astype(jnp.float32) + acc * 0).astype(x.dtype)
            r = fn(Params(w), xi)
            return acc + jnp.sum(jnp.asarray(r).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(params, x, K)); float(run(params, x, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(params, x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


print(f"device: {dev}", flush=True)
for name, (fn, shape) in STAGES.items():
    try:
        t = timeit(fn, dev_normal(shape)) * 1000
        print(f"{name}: {t:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


# A/B for the composition gap: 28 chained window layers with DISTINCT
# weights (no global layers, no neck) — if this times ~28x the isolated
# layer, the gap lives in the window<->global transitions or the neck.
def trunk28(p, x):
    bb = p["backbone"]
    for i in range(vp.n_layers):
        if i in vp.global_attn_indexes:
            continue
        x = vision_layer(bb["layers"][i], x, vp.window_size, vp.n_heads, vp.window_size, 1.0, flash=False)
    return x


t = timeit(trunk28, dev_normal((1, HP, HP, C))) * 1000
print(f"trunk28_window_only: {t:8.3f} ms  (isolated x28 = {28 * 1.75:.1f})", flush=True)
