#!/usr/bin/env python
"""Bisect 4: last two viable forms for the pallas deform inner loop.

s25r (fori + into-ref) compiles but runs 447 Gop/s — every MAC pays a VMEM
RMW, ~6x below XLA's achieved rate on the same op stream. To beat XLA the
accumulator must live in registers:

  roll25 — fori over dy, live acc carry, pltpu.roll for dx (slice+live
           crashed; roll may take a different Mosaic path)
  hyb    — fori over dy: 5 dx MACs into a LIVE acc (under the ~8-MAC crash
           threshold), then ONE o_ref RMW per dy (5 RMWs total, not 25)
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


def roll25(x_ref, c_ref, o_ref):
    def body(dy, acc):
        xx = x_ref[:, :, :]
        for dx in range(5):
            win = pltpu.roll(xx, (WPAD - dx) % WPAD, 1)[:, 0:WO, :]
            acc = acc + win.astype(jnp.float32) * c_ref[dy * 5 + dx][:, :, None]
        return acc

    o_ref[:, :, :] = jax.lax.fori_loop(0, 5, body, jnp.zeros((HB, WO, C), jnp.float32))


def hyb(x_ref, c_ref, o_ref):
    o_ref[:, :, :] = jnp.zeros((HB, WO, C), jnp.float32)

    def body(dy, _):
        acc = x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[dy * 5][:, :, None]
        for dx in range(1, 5):
            acc = acc + x_ref[:, dx : dx + WO, :].astype(jnp.float32) * c_ref[dy * 5 + dx][:, :, None]
        o_ref[:, :, :] += acc
        return 0

    jax.lax.fori_loop(0, 5, body, 0)


x_host = np.asarray(jax.device_get(x.astype(jnp.float32)))
coef_host = np.asarray(coef)
ref_sliced = sum(x_host[:, d : d + WO, :] * coef_host[i][:, :, None] for i, d in enumerate(DXS))

CASES = {"roll25": roll25, "hyb": hyb}


def build(kern):
    return pl.pallas_call(
        kern, out_shape=oshape, grid=(HO // HB,), in_specs=[xspec, cspec], out_specs=ospec
    )


@partial(jax.jit, static_argnames=("which", "k"))
def run_k(x, coef, which, k):
    f = build(CASES[which])

    def body(i, acc):
        xx = (x + (acc * 0).astype(x.dtype)).astype(x.dtype)
        return acc + f(xx, coef)[0, 0, 0]

    return jax.lax.fori_loop(0, k, body, jnp.float32(0))


for which, kern in CASES.items():
    try:
        y = jax.jit(build(kern))(x, coef)
        err = float(jnp.max(jnp.abs(y - ref_sliced)))
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
        print(f"{which:>6}: {per*1e6:8.1f} us/call ({gops/per:6.0f} Gop/s) max|err|={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{which:>6}: FAILED {type(e).__name__}: {msg}", flush=True)
