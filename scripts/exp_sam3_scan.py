#!/usr/bin/env python
"""A/B: SAM3 vision encoder 1008^2 — fused window-major scan trunk vs the
per-layer path (round-3 composition-gap fix, NOTES.md round-2 findings).
Loop-method timing (see vision_tpu/benchmark.py)."""
import os
import sys

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
from vision_tpu.models.random_weights import random_sam3_vision_params
from vision_tpu.models.sam3 import Sam3VitParams, encode_vision, sam3_pack_vision_weights

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8

dev = backend_init()
dtype = dev.preferred_float_type
print(f"device={dev.jax_device} dtype={dtype}", flush=True)

p = Sam3VitParams()
raw = random_sam3_vision_params()
params = {}
for k, v in raw.items():
    a = jax.device_put(v, dev.jax_device)
    if v.dtype == np.float32 and "position_embeddings" not in k:
        a = a.astype(dtype)
    params[k] = a
print("params on device", flush=True)

stack = sam3_pack_vision_weights(params, p)
jax.block_until_ready(stack)
print("stack packed", flush=True)

x = _u8((1, 1008, 1008, 3))


def step_scan(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    out = encode_vision(Params(w["p"]), img, p, flash=True, win_stack=w["s"])
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


def step_layerwise(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    out = encode_vision(Params(w), img, p, flash=True)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


import time

t0 = time.time()
mean, stdev, n = _loop_time(step_scan, {"p": params, "s": stack}, x, k=K, repeats=3)
print(f"SCAN trunk:      {mean:8.1f} ms/iter (stdev {stdev:.1f}, K={n}) [total {time.time()-t0:.0f}s]", flush=True)

t0 = time.time()
mean2, stdev2, n2 = _loop_time(step_layerwise, params, x, k=K, repeats=3)
print(f"LAYERWISE trunk: {mean2:8.1f} ms/iter (stdev {stdev2:.1f}, K={n2}) [total {time.time()-t0:.0f}s]", flush=True)
print(f"speedup: {mean2/mean:.2f}x", flush=True)
