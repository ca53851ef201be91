#!/usr/bin/env python
"""Quantify the ESRGAN packed-RDB epilogue cost: cross-pack 32-lane slice
adds vs aligned-only reads (wrong math, measurement only) at 1024^2."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GC, NF = 32, 64
H = W = 1024
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

# one RDB's packed weights: pack j: (3,3,Cin_j,Cout_j), Cout leads with c5
couts = [NF + 4 * GC, NF + 3 * GC, NF + 2 * GC, NF + GC, NF]
cins = [NF, GC, GC, GC, GC]
packs = [jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.05).astype(dtype) for ci, co in zip(cins, couts)]
biases = [jnp.asarray(rng.normal(size=(co0,)).astype(np.float32) * 0.01) for co0 in [GC, GC, GC, GC, NF]]


def conv(src, w):
    return jax.lax.conv_general_dilated(
        src, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(src.dtype)


lrelu = lambda t: jnp.where(t >= 0, t, 0.2 * t)


def rdb_current(x):
    b1, b2, b3, b4, b5 = (b.astype(x.dtype) for b in biases)
    o = NF
    p0 = conv(x, packs[0])
    x1 = lrelu(p0[..., o : o + GC] + b1)
    p1 = conv(x1, packs[1])
    x2 = lrelu(p0[..., o + GC : o + 2 * GC] + p1[..., o : o + GC] + b2)
    p2 = conv(x2, packs[2])
    x3 = lrelu(p0[..., o + 2 * GC : o + 3 * GC] + p1[..., o + GC : o + 2 * GC] + p2[..., o : o + GC] + b3)
    p3 = conv(x3, packs[3])
    x4 = lrelu(p0[..., o + 3 * GC :] + p1[..., o + 2 * GC : o + 3 * GC] + p2[..., o + GC : o + 2 * GC] + p3[..., o : o + GC] + b4)
    p4 = conv(x4, packs[4])
    x5 = p0[..., :o] + p1[..., :o] + p2[..., :o] + p3[..., :o] + p4 + b5
    return x + 0.2 * x5


def rdb_aligned_only(x):
    """WRONG math: every x_k reads only its producing pack at offset o
    (aligned c5-skip read) — isolates the cross-slice add tax."""
    b1, b2, b3, b4, b5 = (b.astype(x.dtype) for b in biases)
    o = NF
    p0 = conv(x, packs[0])
    x1 = lrelu(p0[..., o : o + GC] + b1)
    p1 = conv(x1, packs[1])
    x2 = lrelu(p1[..., o : o + GC] + b2)
    p2 = conv(x2, packs[2])
    x3 = lrelu(p2[..., o : o + GC] + b3)
    p3 = conv(x3, packs[3])
    x4 = lrelu(p3[..., o : o + GC] + b4)
    p4 = conv(x4, packs[4])
    x5 = p0[..., :o] + p1[..., :o] + p2[..., :o] + p3[..., :o] + p4 + b5
    return x + 0.2 * x5


def rdb_convs_only(x):
    """WRONG math: chain the convs with no epilogue slicing at all."""
    p0 = conv(x, packs[0])
    x1 = lrelu(p0[..., :GC])
    p1 = conv(x1, packs[1])
    x2 = lrelu(p1[..., :GC])
    p2 = conv(x2, packs[2])
    x3 = lrelu(p2[..., :GC])
    p3 = conv(x3, packs[3])
    x4 = lrelu(p3[..., :GC])
    p4 = conv(x4, packs[4])
    return x + 0.2 * (p4 + p3[..., :NF] + p2[..., :NF] + p1[..., :NF] + p0[..., :NF])


def timeit(fn, x, K=16):
    @partial(jax.jit, static_argnames=("kk",))
    def run(x, kk):
        def body(i, acc):
            xi = (x.astype(jnp.float32) + acc * 0).astype(x.dtype)
            return acc + jnp.sum(fn(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(x, K)); float(run(x, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


x = (jax.random.normal(key, (1, H, W, NF)) * 0.5).astype(dtype)
print(f"device: {jax.devices()[0]}", flush=True)
for name, fn in [("current", rdb_current), ("aligned_only", rdb_aligned_only), ("convs_only", rdb_convs_only)]:
    t = timeit(fn, x) * 1000
    print(f"{name}: {t:7.3f} ms", flush=True)
