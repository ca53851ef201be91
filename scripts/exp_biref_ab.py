#!/usr/bin/env python
"""Model-level A/B: birefnet-1024 with f32 vs input-dtype deform window
multiplies (the module-level isolated win was 1.52x; the benchmark row
moved the WRONG way vs the round-2c sweep, so measure the whole model both
ways in one session)."""
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

import vision_tpu.ops.deform as D
from vision_tpu.benchmark import BENCHMARKS, _loop_time
from vision_tpu.core.device import backend_init

dev = backend_init()
dtype = dev.preferred_float_type
print(f"device={dev.jax_device}", flush=True)

orig = D.deform_conv_2d_shift


def shift_f32(x, weight, offset, mask=None, stride=1, pad=0, bound=4):
    """The round-2 implementation verbatim (bf16 slices, f32 multiplies)."""
    b, h, w, cin = x.shape
    cout, _, kh, kw = weight.shape
    ho, wo = offset.shape[1], offset.shape[2]
    f32 = jnp.float32
    off = jnp.clip(jnp.transpose(offset, (3, 0, 1, 2)).astype(f32), -bound, bound)
    mask_t = None if mask is None else jnp.transpose(mask, (3, 0, 1, 2)).astype(f32)
    pw = pad + bound
    xp = jnp.pad(x, ((0, 0), (pw, pw), (pw, pw), (0, 0)))
    out = jnp.zeros((b, ho, wo, cout), f32)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        offy = off[2 * k][..., None]
        offx = off[2 * k + 1][..., None]
        acc = jnp.zeros((b, ho, wo, cin), f32)
        for dy in range(-bound, bound + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(offy - dy))
            r0 = pw - pad + ky + dy
            rows = jax.lax.slice(
                xp, (0, r0, 0, 0), (b, r0 + (ho - 1) * stride + 1, xp.shape[2], cin),
                (1, stride, 1, 1),
            )
            inner = jnp.zeros((b, ho, wo, cin), f32)
            for dx in range(-bound, bound + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(offx - dx))
                c0 = pw - pad + kx + dx
                win = jax.lax.slice(
                    rows, (0, 0, c0, 0), (b, ho, c0 + (wo - 1) * stride + 1, cin),
                    (1, 1, stride, 1),
                )
                inner = inner + win.astype(f32) * wx
            acc = acc + inner * wy
        if mask_t is not None:
            acc = acc * mask_t[k][..., None]
        wk = weight[:, :, ky, kx].astype(f32)
        out = out + jnp.matmul(acc, wk.T, preferred_element_type=f32)
    return out.astype(x.dtype)


for name in ("birefnet-1024",):
    for tag, fn in (("input-dtype", orig), ("f32", shift_f32)):
        D.deform_conv_2d_shift = fn
        step, params, x = BENCHMARKS[name](dev, dtype)
        t0 = time.time()
        mean, stdev, n = _loop_time(step, params, x, k=8, repeats=3)
        print(f"{name} {tag:>12}: {mean:6.1f} ms (stdev {stdev:.1f}) [total {time.time()-t0:.0f}s]", flush=True)
D.deform_conv_2d_shift = orig
