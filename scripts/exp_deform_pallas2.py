#!/usr/bin/env python
"""Bisect which construct crashes remote Mosaic in the deform micro-probe.

exp_deform_pallas.py: even the ALIGNED 25-MAC control kernel got HTTP 500
from the remote compiler, so the failure predates the contested sublane
shifts. Ladder (all on (256, 264, 128) bf16, HB=16 blocks):

  d0 copy      — out = x * 2                        (3D blockspec alone)
  d1 slice     — out = x[:, 2:258, :] * 2           (one static sublane slice)
  d2 bcast     — out = x[:, :256, :] * c[:, :, None] (minor-dim f32 broadcast)
  d3 bcast3d   — same but coef passed pre-shaped (HB, WO, 1)
  d4 mac8      — 8 aligned MACs with broadcast coef (partial real body)
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
coef = jnp.asarray(rng.standard_normal((8, HO, WO)), jnp.float32)
coef3d = jnp.asarray(rng.standard_normal((HO, WO, 1)), jnp.float32)

xspec = pl.BlockSpec((HB, WPAD, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
cspec = pl.BlockSpec((8, HB, WO), lambda h: (0, h, 0), memory_space=pltpu.VMEM)
c3spec = pl.BlockSpec((HB, WO, 1), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
ospec = pl.BlockSpec((HB, WO, C), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((HO, WO, C), jnp.float32)


def d0(x_ref, o_ref):
    o_ref[:, :, :] = x_ref[:, 0:WO, :].astype(jnp.float32) * 2.0


def d1(x_ref, o_ref):
    o_ref[:, :, :] = x_ref[:, 2 : 2 + WO, :].astype(jnp.float32) * 2.0


def d2(x_ref, c_ref, o_ref):
    cf = c_ref[0][:, :, None]
    o_ref[:, :, :] = x_ref[:, 0:WO, :].astype(jnp.float32) * cf


def d3(x_ref, c_ref, o_ref):
    o_ref[:, :, :] = x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[:, :, :]


def d4(x_ref, c_ref, o_ref):
    acc = jnp.zeros((HB, WO, C), jnp.float32)
    for d in range(8):
        acc = acc + x_ref[:, 0:WO, :].astype(jnp.float32) * c_ref[d][:, :, None]
    o_ref[:, :, :] = acc


cases = [
    ("d0 copy", d0, [xspec], (x,)),
    ("d1 slice", d1, [xspec], (x,)),
    ("d2 bcast", d2, [xspec, cspec], (x, coef)),
    ("d3 bcast3d", d3, [xspec, c3spec], (x, coef3d)),
    ("d4 mac8", d4, [xspec, cspec], (x, coef)),
]

for name, kern, specs, args in cases:
    try:
        f = jax.jit(
            pl.pallas_call(
                kern, out_shape=oshape, grid=(HO // HB,), in_specs=specs, out_specs=ospec
            )
        )
        t0 = time.perf_counter()
        y = f(*args)
        s = float(jnp.sum(y))
        print(f"{name:>10}: ok  sum={s:.3e}  ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name:>10}: FAILED {type(e).__name__}: {msg}", flush=True)
