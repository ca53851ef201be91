#!/usr/bin/env python
"""Micro-probe: is a pallas bounded-shift deform kernel viable on this env?

VERDICT r2 #7 asks for one more swing at the BiRefNet k=7 deform module
(11.1 ms of ~50) as a pallas VMEM-halo kernel. The kernel's fate hinges on
ONE cost: the inner dx loop needs W-axis (sublane) shifted reads of the
VMEM tile at offsets 0..4 — exactly the static-slice relayout tax that
made the round-1 RDB kernel 8x slower than XLA, and the op count floor
(~30 G VPU-ops) only beats XLA if those shifts are near-free.

So before building the 49-tap kernel, measure the contested op in
isolation on tiles of the module's exact geometry (Ho=Wo=256, C=112->128,
bf16 windows, f32 accumulate):

  A aligned   — 25x: acc += coeff_d[:, :, None] * x[:, 0:256, :]
  B sliced    — 25x: acc += coeff_d[:, :, None] * x[:, dx_d:dx_d+256, :]
  C rolled    — 25x: acc += coeff_d[:, :, None] * roll(x, -dx_d, axis=1)[:, 0:256, :]

If B (or C) ~= A, the full kernel's floor (~6 ms vs 11.1 XLA) is live —
build it. If B >= 2x A, the kernel cannot beat XLA and the VERDICT item
closes with this number. Round-2's conv probes crashed the remote Mosaic
compiler at 1024^2; these are 256^2 elementwise kernels, so also probes
whether Mosaic accepts the shape class at all.
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

HO, WO, C = 256, 256, 128
WPAD = WO + 8  # halo columns for the shifted reads
HB = 16  # rows per grid block
NWIN = 25  # windows per tap in the bound=2 deform
DXS = [0, 1, 2, 3, 4] * 5  # the dx pattern of the 25 windows


def make_kernel(mode):
    def kernel(x_ref, coef_ref, out_ref):
        acc = jnp.zeros((HB, WO, C), jnp.float32)
        for d in range(NWIN):
            dx = DXS[d]
            cf = coef_ref[d][:, :, None]  # (HB, WO, 1) f32
            if mode == "aligned":
                win = x_ref[:, 0:WO, :]
            elif mode == "sliced":
                win = x_ref[:, dx : dx + WO, :]
            else:  # rolled
                win = pltpu.roll(x_ref[:, :, :], -dx, 1)[:, 0:WO, :]
            acc = acc + win.astype(jnp.float32) * cf
        out_ref[:, :, :] = acc

    return kernel


def build(mode, interpret=False):
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((HO, WO, C), jnp.float32),
        grid=(HO // HB,),
        in_specs=[
            pl.BlockSpec((HB, WPAD, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NWIN, HB, WO), lambda h: (0, h, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HB, WO, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((HO, WPAD, C)), jnp.bfloat16)
coef = jnp.asarray(rng.standard_normal((NWIN, HO, WO)), jnp.float32)

# correctness vs plain jnp (interpret mode on CPU backend is slow; do it
# directly on device vs an XLA reference instead)
x_host = np.asarray(jax.device_get(x.astype(jnp.float32)))
coef_host = np.asarray(coef)
ref_sliced = sum(
    x_host[:, d : d + WO, :] * coef_host[i][:, :, None] for i, d in enumerate(DXS)
)


@partial(jax.jit, static_argnames=("mode", "k"))
def run_k(x, coef, mode, k):
    f = build(mode)

    def body(i, acc):
        xx = (x + (acc * 0).astype(x.dtype)).astype(x.dtype)
        y = f(xx, coef)
        return acc + y[0, 0, 0]

    return jax.lax.fori_loop(0, k, body, jnp.float32(0))


for mode in ("aligned", "sliced", "rolled"):
    try:
        y = jax.jit(build(mode))(x, coef)
        err = float(jnp.max(jnp.abs(y - ref_sliced))) if mode != "aligned" else float("nan")
        K = 64
        float(run_k(x, coef, mode, K))
        float(run_k(x, coef, mode, 1))

        def best(k, n=3):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                float(run_k(x, coef, mode, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (best(K) - best(1)) / (K - 1)
        gops = NWIN * 2 * HO * WO * C / 1e9
        print(
            f"{mode:>8}: {per*1e6:8.1f} us/call  ({gops/per:6.1f} Gop/s)"
            f"  max|err|={err:.2e}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{mode:>8}: FAILED {type(e).__name__}: {msg}", flush=True)
