#!/usr/bin/env python
"""Dissect the packed-RDB epilogue overhead (16.57ms full vs 11.66ms bare)
and measure batch-2 scaling."""
import os, sys, time
from functools import partial
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from vision_tpu.models.esrgan import EsrganParams, esrgan_pack_weights
from vision_tpu.models.random_weights import random_esrgan_params

p = EsrganParams(scale=4, n_blocks=1)
raw = random_esrgan_params(seed=0, nb=1)
dev = jax.devices()[0]
params = {k: jax.device_put(v, dev) for k, v in raw.items()}
packed = esrgan_pack_weights(params, p, dtype=jnp.bfloat16)
packs = [pk[0, 0] for pk in packed["rdb_packs"]]
biases = [b[0, 0].astype(jnp.bfloat16) for b in packed["rdb_biases"]]
res = 1024
x1024 = jnp.asarray(np.random.default_rng(0).standard_normal((1, res, res, 64)), jnp.bfloat16) * 0.2
x2 = jnp.asarray(np.random.default_rng(0).standard_normal((2, res, res, 64)), jnp.bfloat16) * 0.2

def conv(src, w):
    return jax.lax.conv_general_dilated(src, w, (1,1), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32).astype(src.dtype)

lrelu = lambda t: jnp.where(t >= 0, t, 0.2 * t)
gc = 32

def rdb_full(x, ws=packs, bs=biases):
    b1,b2,b3,b4,b5 = bs
    p0 = conv(x, ws[0])
    x1 = lrelu(p0[..., :gc] + b1)
    p1 = conv(x1, ws[1])
    xx2 = lrelu(p0[..., gc:2*gc] + p1[..., :gc] + b2)
    p2 = conv(xx2, ws[2])
    x3 = lrelu(p0[..., 2*gc:3*gc] + p1[..., gc:2*gc] + p2[..., :gc] + b3)
    p3 = conv(x3, ws[3])
    x4 = lrelu(p0[..., 3*gc:4*gc] + p1[..., 2*gc:3*gc] + p2[..., gc:2*gc] + p3[..., :gc] + b4)
    p4 = conv(x4, ws[4])
    x5 = p0[..., 4*gc:] + p1[..., 3*gc:] + p2[..., 2*gc:] + p3[..., gc:] + p4 + b5
    return x + 0.2 * x5

def rdb_no_cross(x, ws=packs, bs=biases):
    """bias+lrelu epilogues, but each x_j from its own conv only."""
    b1,b2,b3,b4,b5 = bs
    p0 = conv(x, ws[0]); x1 = lrelu(p0[..., :gc] + b1)
    p1 = conv(x1, ws[1]); xx2 = lrelu(p1[..., :gc] + b2)
    p2 = conv(xx2, ws[2]); x3 = lrelu(p2[..., :gc] + b3)
    p3 = conv(x3, ws[3]); x4 = lrelu(p3[..., :gc] + b4)
    p4 = conv(x4, ws[4])
    return x + 0.2 * (p4 + b5)

def rdb_no_tail(x, ws=packs, bs=biases):
    """full cross adds but cheap tail."""
    b1,b2,b3,b4,b5 = bs
    p0 = conv(x, ws[0])
    x1 = lrelu(p0[..., :gc] + b1)
    p1 = conv(x1, ws[1])
    xx2 = lrelu(p0[..., gc:2*gc] + p1[..., :gc] + b2)
    p2 = conv(xx2, ws[2])
    x3 = lrelu(p0[..., 2*gc:3*gc] + p1[..., gc:2*gc] + p2[..., :gc] + b3)
    p3 = conv(x3, ws[3])
    x4 = lrelu(p0[..., 3*gc:4*gc] + p1[..., 2*gc:3*gc] + p2[..., gc:2*gc] + p3[..., :gc] + b4)
    p4 = conv(x4, ws[4])
    return x + 0.2 * (p4 + b5)

def timeit(fn, x, K=16):
    @partial(jax.jit, static_argnames=("kk",))
    def run(x, kk):
        def body(i, acc):
            xi = x + (acc*0).astype(x.dtype)
            return acc + jnp.sum(fn(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)
    float(run(x, K)); float(run(x, 1))
    def best(kk, n=3):
        ts=[]
        for _ in range(n):
            t0=time.perf_counter(); float(run(x,kk)); ts.append(time.perf_counter()-t0)
        return min(ts)
    return (best(K)-best(1))/(K-1)

for label, fn in (("full", rdb_full), ("no_cross", rdb_no_cross), ("no_tail", rdb_no_tail)):
    t = timeit(fn, x1024)
    print(f"rdb {label} b1: {t*1000:6.2f} ms", flush=True)
t = timeit(rdb_full, x2)
print(f"rdb full b2: {t*1000:6.2f} ms ({t*1000/2:.2f}/img)", flush=True)
