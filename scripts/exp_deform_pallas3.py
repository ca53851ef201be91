#!/usr/bin/env python
"""Bisect 2: the crasher is the unrolled MAC accumulation (d4 in probe 2).

Find the breaking count and whether accumulation style matters:
  m2/m4/m6     — unrolled MACs into a live acc value
  r8           — 8 MACs accumulated INTO o_ref (no live acc)
  f8 / f25     — fori_loop over windows, coef indexed dynamically
  s25          — fori over 5 dy x unrolled 5 static dx slices (real deform shape)
"""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_tpu.core.device import backend_init

dev = backend_init()
print(f"device={dev.jax_device}", flush=True)

HO, WO, C, HB = 256, 256, 128, 16
WPAD = WO + 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((HO, WPAD, C)), jnp.bfloat16)
coef = jnp.asarray(rng.standard_normal((25, HO, WO)), jnp.float32)

xspec = pl.BlockSpec((HB, WPAD, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
cspec = pl.BlockSpec((25, HB, WO), lambda h: (0, h, 0), memory_space=pltpu.VMEM)
ospec = pl.BlockSpec((HB, WO, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((HO, WO, C), jnp.float32)


def unrolled(n):
    def kern(x_ref, c_ref, o_ref):
        acc = jnp.zeros((HB, WO, C), jnp.float32)
        for d in range(n):
            acc = acc + x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[d][:, :, None]
        o_ref[:, :, :] = acc

    return kern


def into_ref(n):
    def kern(x_ref, c_ref, o_ref):
        o_ref[:, :, :] = jnp.zeros((HB, WO, C), jnp.float32)
        for d in range(n):
            o_ref[:, :, :] += x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[d][:, :, None]

    return kern


def fori(n):
    def kern(x_ref, c_ref, o_ref):
        def body(d, acc):
            return acc + x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[d][:, :, None]

        o_ref[:, :, :] = jax.lax.fori_loop(0, n, body, jnp.zeros((HB, WO, C), jnp.float32))

    return kern


def dy_fori_dx_static(x_ref, c_ref, o_ref):
    # the real deform inner structure: dynamic dy row window (untiled axis),
    # static dx sublane slices, coef plane per (dy, dx)
    def body(dy, acc):
        for dx in range(5):
            win = x_ref[:, dx : dx + WO, :]
            acc = acc + win.astype(jnp.float32) * c_ref[dy * 5 + dx][:, :, None]
        return acc

    o_ref[:, :, :] = jax.lax.fori_loop(0, 5, body, jnp.zeros((HB, WO, C), jnp.float32))


cases = [
    ("m2", unrolled(2)),
    ("m4", unrolled(4)),
    ("m6", unrolled(6)),
    ("r8", into_ref(8)),
    ("f8", fori(8)),
    ("f25", fori(25)),
    ("s25", dy_fori_dx_static),
]

for name, kern in cases:
    try:
        f = jax.jit(
            pl.pallas_call(
                kern, out_shape=oshape, grid=(HO // HB,), in_specs=[xspec, cspec], out_specs=ospec
            )
        )
        t0 = time.perf_counter()
        s = float(jnp.sum(f(x, coef)))
        print(f"{name:>4}: ok  sum={s:.4e}  ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name:>4}: FAILED {type(e).__name__}: {msg}", flush=True)
