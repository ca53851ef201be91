#!/usr/bin/env python
"""TPU experiment (round 3, VERDICT #7): deform bounded-shift arithmetic
dtype. The shift path is elementwise-bound (25 windows x 49 taps of VPU
multiply-adds, all f32 today). Variants:

  f32   — current production (all f32)
  mixed — window multiplies in bf16, accumulation in f32
  bf16  — everything bf16 (accuracy checked against f32)

Also prints the max|delta| of each variant vs the f32 path.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def deform_shift_dt(x, weight, offset, mask, stride, pad, bound, mode):
    """deform_conv_2d_shift with parameterized arithmetic dtype."""
    b, h, w, cin = x.shape
    cout, _, kh, kw = weight.shape
    ho, wo = offset.shape[1], offset.shape[2]
    f32 = jnp.float32
    mul_dt = f32 if mode == "f32" else jnp.bfloat16
    acc_dt = jnp.bfloat16 if mode == "bf16" else f32
    off = jnp.clip(jnp.transpose(offset, (3, 0, 1, 2)).astype(f32), -bound, bound)
    mask_t = jnp.transpose(mask, (3, 0, 1, 2)).astype(acc_dt)
    pw = pad + bound
    xp = jnp.pad(x, ((0, 0), (pw, pw), (pw, pw), (0, 0))).astype(mul_dt)

    out = jnp.zeros((b, ho, wo, cout), f32)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        offy = off[2 * k][..., None]
        offx = off[2 * k + 1][..., None]
        acc = jnp.zeros((b, ho, wo, cin), acc_dt)
        for dy in range(-bound, bound + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(offy - dy)).astype(mul_dt)
            r0 = pw - pad + ky + dy
            rows = jax.lax.slice(
                xp, (0, r0, 0, 0), (b, r0 + (ho - 1) * stride + 1, xp.shape[2], cin),
                (1, stride, 1, 1),
            )
            inner = jnp.zeros((b, ho, wo, cin), acc_dt)
            for dx in range(-bound, bound + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(offx - dx)).astype(mul_dt)
                c0 = pw - pad + kx + dx
                win = jax.lax.slice(
                    rows, (0, 0, c0, 0), (b, ho, c0 + (wo - 1) * stride + 1, cin),
                    (1, 1, stride, 1),
                )
                inner = inner + (win * wx).astype(acc_dt)
            acc = acc + (inner * wy.astype(acc_dt)).astype(acc_dt)
        acc = acc * mask_t[k][..., None]
        wk = weight[:, :, ky, kx].astype(jnp.bfloat16 if mode != "f32" else f32)
        out = out + jnp.matmul(acc.astype(wk.dtype), wk.T, preferred_element_type=f32)
    return out.astype(x.dtype)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cin, cout = 112, 28
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, res, res, cin)), jnp.bfloat16) * 0.3
    bound = 2

    for k in (7, 3):
        pad = k // 2
        w = jnp.asarray(rng.standard_normal((cout, cin, k, k)), jnp.bfloat16) * 0.05
        off = jnp.asarray(rng.standard_normal((1, res, res, 2 * k * k)), jnp.bfloat16) * 1.5
        m = jnp.asarray(rng.random((1, res, res, k * k)), jnp.bfloat16)

        outs = {}
        for mode in ("f32", "mixed", "bf16"):
            fn = partial(deform_shift_dt, stride=1, pad=pad, bound=bound, mode=mode)

            @partial(jax.jit, static_argnames=("kk",))
            def run_k(x, w, off, m, kk, fn=fn):
                def body(i, acc):
                    xi = x + (acc * 0).astype(x.dtype)
                    y = fn(xi, w, off, m)
                    return acc + jnp.sum(y.astype(jnp.float32))

                return jax.lax.fori_loop(0, kk, body, 0.0)

            K = 8
            t0 = time.perf_counter()
            float(run_k(x, w, off, m, K))
            c = time.perf_counter() - t0
            float(run_k(x, w, off, m, 1))

            def best(kk, n=3):
                return min(
                    (lambda t0=time.perf_counter(): (float(run_k(x, w, off, m, kk)), time.perf_counter() - t0)[1])()
                    for _ in range(n)
                )

            per = (best(K) - best(1)) / (K - 1)
            outs[mode] = np.asarray(
                jax.jit(fn)(x, w, off, m).astype(jnp.float32)
            )
            d = np.abs(outs[mode] - outs["f32"]).max() if "f32" in outs else 0.0
            print(f"k={k} {mode:>5}: {per*1000:7.2f} ms  max|delta|={d:.3e}  (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
