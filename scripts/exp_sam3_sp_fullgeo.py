#!/usr/bin/env python
"""Compile-check SAM3 sequence parallelism at the REAL ViT-H geometry.

The sp parity tests use a reduced 32 px geometry; this probe proves the
canonical 1008 px / patch 14 / window 24 program (72x72 grid, 9 windows)
compiles and partitions on an sp=3 x tp=2 mesh — the sub-mesh recipe for
power-of-2 slices (docs/performance.md). On the 8-virtual-device CPU mesh
it compiles in ~16 s with the expected collective pattern: tp all-reduces
(row-parallel o_proj/fc2 psums), all-gathers only for the globals' K/V and
the pre-neck output, and ZERO collectives inside the window scans
(NOTES.md round-4f).
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.random_weights import random_sam3_vision_params
from vision_tpu.models.sam3 import (
    Sam3VitParams,
    encode_vision,
    sam3_pack_vision_weights,
    sam3_shard_vision,
)
from vision_tpu.parallel import make_mesh

vp = Sam3VitParams()  # canonical ViT-H: 1008 px, 32 layers, 9 windows
t0 = time.time()
params = dict(random_sam3_vision_params())
stack = sam3_pack_vision_weights(params, vp, prefix="backbone.")
print(f"params built {time.time() - t0:.0f}s")

mesh = make_mesh(6, tp=2, sp=3)  # sp=3 divides the 9 windows; 6-chip sub-mesh
params, stack = sam3_shard_vision(params, stack, mesh)
fn = jax.jit(
    lambda p, s, xx: encode_vision(Params(p), xx, vp, win_stack=s, mesh=mesh).fpn_hidden_states
)
x = jnp.zeros((1, vp.image_size, vp.image_size, 3), jnp.float32)

t0 = time.time()
comp = fn.lower(params, stack, x).compile()
print(f"compiled {time.time() - t0:.0f}s")
hlo = comp.as_text()
print(
    "collectives:",
    {op: len(re.findall(op, hlo)) for op in ("all-gather", "all-reduce", "collective-permute")},
)
print("SP-FULLGEO-OK")
