#!/usr/bin/env python
"""A/B #2: SAM3 fused trunk — lax.scan over stacked window weights vs the
same window-major layout with the 28 layers UNROLLED (separates the layout
win from the scan-prefetch win, and checks whether the while-loop carries
any overhead of its own)."""
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
from vision_tpu.models.random_weights import random_sam3_vision_params
from vision_tpu.models import sam3 as S

dev = backend_init()
dtype = dev.preferred_float_type
p = S.Sam3VitParams()
raw = random_sam3_vision_params()
params = {}
for k, v in raw.items():
    a = jax.device_put(v, dev.jax_device)
    if v.dtype == np.float32 and "position_embeddings" not in k:
        a = a.astype(dtype)
    params[k] = a
stack = S.sam3_pack_vision_weights(params, p)
jax.block_until_ready(stack)
print("packed", flush=True)


def vt_unrolled(pp, win_stack, image, vp, flash):
    """vision_transformer_scan with the scans replaced by python loops."""
    x = S.vision_embed(pp["embeddings"], image, vp.patch_size)
    x = S.layer_norm(pp["layer_norm"], x)
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
    glb_tables = S._rope_tables_pos(px, py, c // vp.n_heads)
    for kind, a, n in S.sam3_window_runs(vp):
        if kind == "win":
            for i in range(a, a + n):
                w_i = {k: v[i] for k, v in win_stack.items()}
                x = S._vision_layer_tokens(Params(w_i), x, vp.n_heads, win, 1.0)
        else:
            t = x.reshape(b, nw * win * win, c)
            t = S._vision_layer_tokens(
                pp["layers"][a], t, vp.n_heads, 0, 0.0, flash=flash, tables=glb_tables
            )
            x = t.reshape(b * nw, win * win, c)
    x = x.reshape(b, nwh, nww, win, win, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, c)


def step_unrolled(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    x = vt_unrolled(Params(w["p"])["backbone"], w["s"], img, p, True)
    out = S.vision_neck(Params(w["p"])["neck"], x)
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


def step_scan(w, xx):
    img = xx.astype(dtype) / 127.5 - 1.0
    out = S.encode_vision(Params(w["p"]), img, p, flash=True, win_stack=w["s"])
    return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)


x = _u8((1, 1008, 1008, 3))
K = 8
t0 = time.time()
m1, s1, _ = _loop_time(step_scan, {"p": params, "s": stack}, x, k=K, repeats=3)
print(f"scan:     {m1:7.1f} ms/iter (stdev {s1:.1f}) [total {time.time()-t0:.0f}s]", flush=True)
t0 = time.time()
m2, s2, _ = _loop_time(step_unrolled, {"p": params, "s": stack}, x, k=K, repeats=3)
print(f"unrolled: {m2:7.1f} ms/iter (stdev {s2:.1f}) [total {time.time()-t0:.0f}s]", flush=True)
