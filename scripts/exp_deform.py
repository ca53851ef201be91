#!/usr/bin/env python
"""TPU experiment: deformable conv gather vs bounded-shift at BiRefNet
block1 shapes (inter=112, co=28, 256x256 for a 1024^2 input)."""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vision_tpu.ops.deform import deform_conv_2d, deform_conv_2d_shift

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cin, cout = 112, 28
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, res, res, cin)), jnp.bfloat16) * 0.3

    for k in (7, 3, 1):
        pad = k // 2
        w = jnp.asarray(rng.standard_normal((cout, cin, k, k)), jnp.bfloat16) * 0.05
        off = jnp.asarray(rng.standard_normal((1, res, res, 2 * k * k)), jnp.bfloat16) * 1.5
        m = jnp.asarray(rng.random((1, res, res, k * k)), jnp.bfloat16)

        def timeit(fn, label, K=8):
            @partial(jax.jit, static_argnames=("kk",))
            def run_k(x, w, off, m, kk):
                def body(i, acc):
                    xi = x + (acc * 0).astype(x.dtype)
                    y = fn(xi, w, off, m)
                    return acc + jnp.sum(y.astype(jnp.float32))
                return jax.lax.fori_loop(0, kk, body, 0.0)

            t0 = time.perf_counter()
            float(run_k(x, w, off, m, K))
            c = time.perf_counter() - t0
            float(run_k(x, w, off, m, 1))
            def best(kk, n=3):
                ts = []
                for _ in range(n):
                    t0 = time.perf_counter()
                    float(run_k(x, w, off, m, kk))
                    ts.append(time.perf_counter() - t0)
                return min(ts)
            per = (best(K) - best(1)) / (K - 1)
            print(f"k={k} {label}: {per*1000:7.2f} ms  (compile {c:.0f}s)", flush=True)

        timeit(lambda xi, w, off, m: deform_conv_2d(xi, w, off, m, 1, pad), "gather")
        for bound in (2, 3):
            timeit(
                lambda xi, w, off, m, bound=bound: deform_conv_2d_shift(xi, w, off, m, 1, pad, bound),
                f"shift B={bound}",
            )


if __name__ == "__main__":
    main()
