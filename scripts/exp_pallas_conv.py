#!/usr/bin/env python
"""Probe: can a pallas 3x3 conv beat XLA's on the RDB shapes?

XLA reference points @1024^2 (loop method): 64->192 = 3.60 ms,
32->160 = 2.82 ms. Designs probed:

A. row-block kernel: tile = (TH+2 rows, full W, C); taps via pl.ds row
   shifts (free) x 3 static W-slices (risk: sublane relayout per tap).
B. same but W shifts via pltpu.roll on the sublane axis, concatenated
   along C into one (rows, W, 3C) operand -> 3 dots with K=3C.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv_rowblock(x, w_hwio, variant: str, th: int = 64, interpret: bool = False):
    """x: (1, H, W, C); w: (3, 3, C, Co). pad=1 conv via row-block tiles."""
    _, h, wd, c = x.shape
    co = w_hwio.shape[-1]
    assert h % th == 0
    xp = jnp.pad(x[0], ((8, 8), (1, 1), (0, 0)))  # row halo 8-aligned, W pad 1

    def kernel(x_hbm, w_ref, o_ref, x_vmem, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * th, th + 16), :, :], x_vmem, sem
        )
        dma.start()
        dma.wait()
        acc = jnp.zeros((th * wd, co), jnp.float32)
        if variant == "slices":
            for dy in range(3):
                for dx in range(3):
                    patch = x_vmem[pl.ds(7 + dy, th), dx : dx + wd, :]
                    m = patch.reshape(th * wd, c)
                    acc = acc + jax.lax.dot_general(
                        m, w_ref[dy, dx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        else:  # roll
            for dy in range(3):
                rows = x_vmem[pl.ds(7 + dy, th), :, :]  # (th, W+2, C)
                left = pltpu.roll(rows, 1, 1)   # x[w-1] at position w
                right = pltpu.roll(rows, wd + 1, 1)  # -1 mod (W+2)
                x3 = jnp.concatenate([left, rows, right], axis=-1)  # (th, W+2, 3C)
                m = x3[:, 1 : 1 + wd, :].reshape(th * wd, 3 * c)
                wk = jnp.concatenate([w_ref[dy, 0], w_ref[dy, 1], w_ref[dy, 2]], axis=0)
                acc = acc + jax.lax.dot_general(
                    m, wk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = acc.reshape(th, wd, co).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, wd, co), x.dtype),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, wd, co), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 16, wd + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_hwio)[None]


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    for cin, cout in ((64, 192), (32, 160)):
        x = jnp.asarray(rng.standard_normal((1, 256 if interpret else 1024, 256 if interpret else 1024, cin)), jnp.bfloat16) * 0.3
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.bfloat16) * 0.05

        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

        for variant in ("slices", "roll"):
            try:
                fn = functools.partial(conv_rowblock, variant=variant, interpret=interpret)
                y = fn(x, w)
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"{cin}->{cout} {variant}: max|err|={err:.4f}", flush=True)
                if interpret:
                    continue

                @functools.partial(jax.jit, static_argnames=("kk",))
                def run(x, w, kk, fn=fn):
                    def body(i, acc):
                        xi = x + (acc * 0).astype(x.dtype)
                        return acc + jnp.sum(fn(xi, w).astype(jnp.float32))
                    return jax.lax.fori_loop(0, kk, body, 0.0)

                float(run(x, w, 16)); float(run(x, w, 1))
                def best(kk, n=3):
                    ts = []
                    for _ in range(n):
                        t0 = time.perf_counter(); float(run(x, w, kk)); ts.append(time.perf_counter() - t0)
                    return min(ts)
                per = (best(16) - best(1)) / 15
                fl = 2 * 9 * cin * cout * 1024 * 1024
                print(f"{cin}->{cout} {variant}: {per*1000:6.2f} ms ({fl/per/1e12:5.1f} TF/s)", flush=True)
            except Exception as e:
                print(f"{cin}->{cout} {variant}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
