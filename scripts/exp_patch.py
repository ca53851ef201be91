#!/usr/bin/env python
"""TinyViT patch_embed probe: where do the 2.9 ms go, and does a 2x2
space-to-depth rewrite of the stride-2 stem conv (Cin 3 -> 12) help?"""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

C1, C2 = 32, 64
w1 = jnp.asarray(rng.normal(size=(3, 3, 3, C1)).astype(np.float32) * 0.1).astype(dtype)  # HWIO
b1 = jnp.asarray(rng.normal(size=(C1,)).astype(np.float32) * 0.01)
w2 = jnp.asarray(rng.normal(size=(3, 3, C1, C2)).astype(np.float32) * 0.1).astype(dtype)
b2 = jnp.asarray(rng.normal(size=(C2,)).astype(np.float32) * 0.01)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def stem_current(x):
    y = gelu((conv(x, w1, 2, 1) + b1).astype(dtype))
    return gelu((conv(y, w2, 2, 1) + b2).astype(dtype))


# --- s2d rewrite of conv1: stride-2 3x3 on (H,W,3) == 2x2-stride-1 conv on
# the (H/2, W/2, 12) block tensor with taps scattered by parity.
# out(i,j) = sum_{u,v in 0..2} w[u,v] x[2i+u-1, 2j+v-1]
# block X[i,j,(s,t,c)] = x[2i+s, 2j+t, c]; 2i+u-1 = 2(i+a)+s with
# (a,s) = divmod(u-1, 2) -> a in {-1,0}, so a 2x2 kernel over {i-1,i}x{j-1,j}
# (implemented as pad-left 1 + 2x2 valid conv).
w1_s2d = np.zeros((2, 2, 12, C1), np.float32)
w1_np = np.asarray(w1.astype(jnp.float32))
for u in range(3):
    au, s = divmod(u - 1, 2)
    for v in range(3):
        av, t = divmod(v - 1, 2)
        for c in range(3):
            w1_s2d[au + 1, av + 1, (s * 2 + t) * 3 + c] += w1_np[u, v, c]
w1_s2d = jnp.asarray(w1_s2d).astype(dtype)


def stem_s2d(x):
    b, h, w, c = x.shape
    xb = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xb = jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)
    xb = jnp.pad(xb, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = gelu((conv(xb, w1_s2d, 1, 0) + b1).astype(dtype))
    return gelu((conv(y, w2, 2, 1) + b2).astype(dtype))


def conv1_only(x):
    return gelu((conv(x, w1, 2, 1) + b1).astype(dtype))


def conv2_only(y):
    return gelu((conv(y, w2, 2, 1) + b2).astype(dtype))


def timeit(fn, x, K=32):
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


x = (jax.random.normal(key, (B, 1024, 1024, 3)) * 0.5).astype(dtype)
y = (jax.random.normal(key, (B, 512, 512, C1)) * 0.5).astype(dtype)

# numeric parity
a = np.asarray(stem_current(x).astype(jnp.float32))
bv = np.asarray(stem_s2d(x).astype(jnp.float32))
print("s2d max|d|:", np.abs(a - bv).max(), flush=True)

print(f"device: {jax.devices()[0]}, batch {B}", flush=True)
for name, fn, inp in [
    ("stem_current", stem_current, x),
    ("stem_s2d", stem_s2d, x),
    ("conv1_only", conv1_only, x),
    ("conv2_only", conv2_only, y),
]:
    t = timeit(fn, inp) * 1000
    print(f"{name}: {t:7.3f} ms", flush=True)
