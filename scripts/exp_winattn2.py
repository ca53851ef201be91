#!/usr/bin/env python
"""Pallas window_attention vs XLA bf16-logit path at TinyViT stage
geometries (batch-4 SAM encode)."""
import os, sys, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# The pallas kernel under test was removed from the package (it lost to
# XLA, see NOTES.md); inlined here so the probe stays runnable.
import functools

def _kernel(q_ref, kt_ref, v_ref, bias_ref, hmask_ref, o_ref, *, n_heads, g):
    def body(w, _):
        qw = q_ref[w]
        ktw = kt_ref[w]
        vw = v_ref[w]
        acc = jnp.zeros(qw.shape, jnp.float32)
        for h in range(n_heads):
            m = hmask_ref[h]
            logits = jax.lax.dot_general(
                (qw * m).astype(qw.dtype), ktw,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits + bias_ref[h]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vw.dtype), (vw * m).astype(vw.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + pv
        o_ref[w] = acc.astype(o_ref.dtype)
        return _
    jax.lax.fori_loop(0, g, body, 0)


@functools.partial(jax.jit, static_argnames=("n_heads", "scale", "g", "interpret"))
def window_attention(q, k, v, bias, n_heads, scale, g=8, interpret=False):
    from jax.experimental import pallas as pl
    nw, t, c = q.shape
    tp = -(-t // 8) * 8
    hd = c // n_heads
    if tp != t:
        q = jnp.pad(q, ((0, 0), (0, tp - t), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, tp - t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tp - t), (0, 0)))
        bias = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, tp - t), (0, tp - t)), constant_values=-1e9)
        bias = bias.at[:, t:, :].set(0.0)
    bias = bias.astype(jnp.float32) * 1.0
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kt = jnp.swapaxes(k, 1, 2)
    wpad = (-nw) % g
    if wpad:
        q = jnp.pad(q, ((0, wpad), (0, 0), (0, 0)))
        kt = jnp.pad(kt, ((0, wpad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, wpad), (0, 0), (0, 0)))
    nwp = q.shape[0]
    hmask = np.zeros((n_heads, c), np.float32)
    for h in range(n_heads):
        hmask[h, h * hd : (h + 1) * hd] = 1.0
    hmask = jnp.asarray(hmask)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, g=g),
        out_shape=jax.ShapeDtypeStruct((nwp, tp, c), q.dtype),
        grid=(nwp // g,),
        in_specs=[
            pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, c, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_heads, tp, tp), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_heads, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, tp, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q, kt, v, bias, hmask)
    return out[:nw, :t]


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
