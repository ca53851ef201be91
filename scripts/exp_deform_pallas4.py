#!/usr/bin/env python
"""Bisect 3 + timing: sliced MACs with into-ref accumulation.

Probe 3: live-acc unrolled crashes at ~8 MACs, into-ref and fori are fine,
but static dx slices INSIDE a fori body crash. Try the remaining shapes:

  r25a — 25 aligned MACs, unrolled, into-ref   (control)
  r25s — 25 dx-sliced MACs, unrolled, into-ref (the real deform inner loop)
  s25r — fori over dy, 5 static dx slices, into-ref accumulation

Whichever compiles gets loop-method timed: sliced-vs-aligned ratio is the
go/no-go for the full kernel (floor ~6 ms vs XLA 11.1 only if ~1x).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_tpu.core.device import backend_init

dev = backend_init()
print(f"device={dev.jax_device}", flush=True)

HO, WO, C, HB = 256, 256, 128, 16
WPAD = WO + 8
DXS = [0, 1, 2, 3, 4] * 5
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((HO, WPAD, C)), jnp.bfloat16)
coef = jnp.asarray(rng.standard_normal((25, HO, WO)), jnp.float32)

xspec = pl.BlockSpec((HB, WPAD, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
cspec = pl.BlockSpec((25, HB, WO), lambda h: (0, h, 0), memory_space=pltpu.VMEM)
ospec = pl.BlockSpec((HB, WO, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((HO, WO, C), jnp.float32)


def r25(sliced):
    def kern(x_ref, c_ref, o_ref):
        o_ref[:, :, :] = jnp.zeros((HB, WO, C), jnp.float32)
        for d in range(25):
            dx = DXS[d] if sliced else 0
            o_ref[:, :, :] += x_ref[:, dx : dx + WO, :].astype(jnp.float32) * c_ref[d][:, :, None]

    return kern


def s25r(x_ref, c_ref, o_ref):
    o_ref[:, :, :] = jnp.zeros((HB, WO, C), jnp.float32)

    def body(dy, _):
        for dx in range(5):
            o_ref[:, :, :] += (
                x_ref[:, dx : dx + WO, :].astype(jnp.float32) * c_ref[dy * 5 + dx][:, :, None]
            )
        return 0

    jax.lax.fori_loop(0, 5, body, 0)


x_host = np.asarray(jax.device_get(x.astype(jnp.float32)))
coef_host = np.asarray(coef)
ref_sliced = sum(x_host[:, d : d + WO, :] * coef_host[i][:, :, None] for i, d in enumerate(DXS))


def build(kern):
    return pl.pallas_call(
        kern, out_shape=oshape, grid=(HO // HB,), in_specs=[xspec, cspec], out_specs=ospec
    )


@partial(jax.jit, static_argnames=("which", "k"))
def run_k(x, coef, which, k):
    f = build(CASES[which][1])

    def body(i, acc):
        xx = (x + (acc * 0).astype(x.dtype)).astype(x.dtype)
        return acc + f(xx, coef)[0, 0, 0]

    return jax.lax.fori_loop(0, k, body, jnp.float32(0))


CASES = {
    "r25a": ("aligned unrolled into-ref", r25(False)),
    "r25s": ("dx-sliced unrolled into-ref", r25(True)),
    "s25r": ("fori-dy sliced into-ref", s25r),
}

for which, (desc, kern) in CASES.items():
    try:
        y = jax.jit(build(kern))(x, coef)
        err = float(jnp.max(jnp.abs(y - ref_sliced))) if which != "r25a" else float("nan")
        K = 64
        float(run_k(x, coef, which, K))
        float(run_k(x, coef, which, 1))

        def best(k, n=3):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(run_k(x, coef, which, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (best(K) - best(1)) / (K - 1)
        gops = 25 * 2 * HO * WO * C / 1e9
        print(
            f"{which} ({desc}): {per*1e6:8.1f} us/call ({gops/per:6.0f} Gop/s) max|err|={err:.2e}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{which} ({desc}): FAILED {type(e).__name__}: {msg}", flush=True)
