#!/usr/bin/env python
"""Probe 2: int8 vs bf16 conv rates, chained design.

The first probe's per-iteration feedback (cast + scale over the full output)
cost ~9 ms/iter and swamped the conv time.  Here each fori_loop iteration
runs a CHAIN of 8 convs (cin == cout, no slicing) and the feedback is the
final output fed straight back in, so per-conv numbers are honest:

    per_conv = (t_K - t_1) / ((K - 1) * CHAIN)

Also measures the 32->192 growth shape via an 8-conv alternating
32->192->(1x1 back to 32) chain, reporting only the 3x3 part by
differencing against a 1x1-only chain.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from vision_tpu.core.device import backend_init

dev = backend_init()
print(f"device={dev.jax_device}", flush=True)

RES = 1024
CHAIN = 8
rng = np.random.default_rng(0)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32,
    )


@partial(jax.jit, static_argnames=("k",))
def run_k(x, ws, k):
    dt = x.dtype

    def body(i, carry):
        acc, xx = carry
        for w in ws:
            y = conv(xx, w)
            if dt == jnp.int8:
                xx = y.astype(jnp.int8)
            else:
                xx = (y * 0.25).astype(dt)
        return acc + y[0, 0, 0, 0].astype(jnp.float32), xx

    out, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x))
    return out


def measure(x, ws, K=8, reps=3):
    float(run_k(x, ws, K))
    float(run_k(x, ws, 1))

    def best(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_k(x, ws, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(K) - best(1)) / ((K - 1) * CHAIN)


for c in (32, 64, 128, 192):
    flops = 2 * RES * RES * c * c * 9
    for dt in (jnp.bfloat16, jnp.int8):
        x = jnp.asarray(rng.integers(-3, 3, (1, RES, RES, c)), dt)
        ws = [jnp.asarray(rng.integers(-2, 2, (3, 3, c, c)), dt) for _ in range(CHAIN)]
        per = measure(x, ws)
        print(
            f"{c:>4}->{c:<4} {np.dtype(dt).name:>8}: {per*1e3:7.3f} ms/conv"
            f"  = {flops/per/1e12:6.1f} TF/s",
            flush=True,
        )
