#!/usr/bin/env python
"""Space-to-depth rewrite of the TinyViT patch-embed stem (the two k3/s2
convs at 1024^2 and 512^2, Cin 3 and 32) — the same block-domain trade that
won the ESRGAN tail (NOTES.md round 2b): a k3/s2 conv equals a k2/s1 conv on
the 2x2-block tensor with a zero-filled (r,s)-merged kernel. 1.78x the
FLOPs, but Cin goes 3->12 / 32->128, filling the contraction lanes the
original shapes waste. Measures baseline vs s2d per conv and combined at
batch 4 (the bench operating point) + parity."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import patch_embed
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops.nn import _conv_nhwc, gelu

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
dtype = jnp.bfloat16

raw = random_mobile_sam_params(seed=0)
dev = jax.devices()[0]
params = {
    k: jax.device_put(v, dev).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}


def s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (r, s, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def blockify_kernel(w):
    """torch (O, I, 3, 3) k3/s2/p1 kernel -> HWIO (2, 2, 4I, O) block kernel.

    out(i,j) taps input row 2i+di-1; di = 2*ki + r - 1 for block-kernel row
    ki in {0,1} and in-block row r in {0,1} (ki=0,r=0 -> di=-1: zero)."""
    o, i = w.shape[0], w.shape[1]
    wb = np.zeros((2, 2, 4 * i, o), np.float32)
    wn = np.asarray(w, np.float32)
    for ki in range(2):
        for kj in range(2):
            for r in range(2):
                for s in range(2):
                    di, dj = 2 * ki + r - 1, 2 * kj + s - 1
                    if 0 <= di < 3 and 0 <= dj < 3:
                        wb[ki, kj, (r * 2 + s) * i : (r * 2 + s + 1) * i, :] = wn[
                            :, :, di, dj
                        ].T
    return wb


def conv_s2d(x_blk, wb, bias):
    y = _conv_nhwc(x_blk, wb, 1, [(1, 0), (1, 0)]).astype(x_blk.dtype)
    return y + bias


enc_p = Params(params)["enc"]["patch_embed"]
_pe = lambda w: Params(w)["enc"]["patch_embed"]
w1 = enc_p["seq"][0]["c"].weight("weight")
b1 = enc_p["seq"][0]["c"].weight("bias")
w2 = enc_p["seq"][2]["c"].weight("weight")
b2 = enc_p["seq"][2]["c"].weight("bias")
wb1 = jnp.asarray(blockify_kernel(w1), dtype)
wb2 = jnp.asarray(blockify_kernel(w2), dtype)


def baseline(w, x):
    return patch_embed(_pe(w), x)


def s2d_conv1(w, x):
    from vision_tpu.models.mobile_sam import conv_2d_bn

    y = gelu(conv_s2d(s2d(x), wb1, b1))
    return conv_2d_bn(_pe(w)["seq"][2], y, 2, 1)


def s2d_conv2(w, x):
    from vision_tpu.models.mobile_sam import conv_2d_bn

    y = gelu(conv_2d_bn(_pe(w)["seq"][0], x, 2, 1))
    return conv_s2d(s2d(y), wb2, b2)


def s2d_both(w, x):
    y = gelu(conv_s2d(s2d(x), wb1, b1))
    return conv_s2d(s2d(y), wb2, b2)


key = jax.random.PRNGKey(0)
x = (jax.random.normal(key, (B, 1024, 1024, 3), jnp.float32) * 0.5).astype(dtype)

# parity first (f32 on device to dodge bf16 noise in the check itself)
ref = np.asarray(jax.jit(baseline)(params, x).astype(jnp.float32))
for name, fn in [("s2d_conv1", s2d_conv1), ("s2d_conv2", s2d_conv2), ("s2d_both", s2d_both)]:
    got = np.asarray(jax.jit(fn)(params, x).astype(jnp.float32))
    d = float(np.abs(got - ref).max())
    print(f"{name}: max|delta| vs baseline = {d:.3e}", flush=True)


def timeit(fn, K=16):
    @partial(jax.jit, static_argnames=("kk",))
    def run(w, xx, kk):
        def body(i, acc):
            xi = (xx.astype(jnp.float32) + acc * 0).astype(xx.dtype)
            return acc + jnp.sum(fn(w, xi).astype(jnp.float32))

        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(params, x, K)); float(run(params, x, 1))

    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(params, x, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(K) - best(1)) / (K - 1)


print(f"device: {dev}, batch {B}", flush=True)
for name, fn in [("baseline", baseline), ("s2d_conv1", s2d_conv1), ("s2d_conv2", s2d_conv2), ("s2d_both", s2d_both)]:
    print(f"{name}: {timeit(fn) * 1000:7.3f} ms", flush=True)
