#!/usr/bin/env python
"""ESRGAN throughput experiments (VERDICT r2 #3): batch-2/4 whole-image at
1024^2, and pack-time zero-padding of the gc=32 growth channels to 64.

The padding variant is EXACT: each x_j (j=1..4) comes out of its producer
conv already 64-wide (upper 32 channels have zero weights + zero bias, so
lrelu keeps them zero), and every consumer pack gains zero rows for those
channels. No pad ops at runtime — only wider convs whose contraction
dimension fills the MXU lanes (measured round-2: Cin=32 convs run at
19-39 TF/s, Cin=64 at ~64 TF/s). FLOPs roughly double; wins iff the rate
gain beats 2x.
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

from vision_tpu.benchmark import _loop_time, _u8
from vision_tpu.core.device import backend_init
from vision_tpu.models.esrgan import EsrganParams, esrgan_generate_packed, esrgan_pack_weights
from vision_tpu.models.random_weights import random_esrgan_params
from vision_tpu.ops.preprocess import normalize_u8

dev = backend_init()
dtype = dev.preferred_float_type
print(f"device={dev.jax_device}", flush=True)

p = EsrganParams(4, 23)
raw = random_esrgan_params(0)
dev_params = {k: jax.device_put(v, dev.jax_device) for k, v in raw.items()}
packed = esrgan_pack_weights(dev_params, p, dtype=jnp.bfloat16)
gc, nf = packed.pop("gc"), packed.pop("nf")
jax.block_until_ready(packed)
print("packed", flush=True)


def pad_packs_to(packed, gc, nf, gpad):
    """Zero-pad the growth channels gc -> gpad in every pack (exact)."""
    packs, biases = packed["rdb_packs"], packed["rdb_biases"]
    out_p, out_b = [], []
    for j in range(5):
        pk = np.asarray(packs[j], np.float32)  # (nb,3,3,3,Cin,Cout)
        nb3 = pk.shape[:2]
        cin = pk.shape[4]
        # split Cout: [c5(nf) | k blocks of gc]
        nblk = (pk.shape[5] - nf) // gc
        blocks = [pk[..., :nf]]
        for b in range(nblk):
            blk = pk[..., nf + b * gc : nf + (b + 1) * gc]
            pad = np.zeros(blk.shape[:-1] + (gpad - gc,), np.float32)
            blocks.append(np.concatenate([blk, pad], axis=-1))
        pk = np.concatenate(blocks, axis=-1)
        if j >= 1:  # consumer of x_j: Cin gc -> gpad zero rows
            pad = np.zeros(pk.shape[:4] + (gpad - cin,) + pk.shape[5:], np.float32)
            pk = np.concatenate([pk, pad], axis=4)
        out_p.append(jnp.asarray(pk, jnp.bfloat16))
        bb = np.asarray(biases[j], np.float32)
        if j < 4:  # b1..b4 produce x_{j+1}: widen to gpad
            bb = np.concatenate([bb, np.zeros(bb.shape[:-1] + (gpad - gc,), np.float32)], -1)
        out_b.append(jnp.asarray(bb, jnp.float32))
    return {**packed, "rdb_packs": tuple(out_p), "rdb_biases": tuple(out_b)}


def make_step(pk, g):
    def step(w, x):
        img = normalize_u8(x, dtype=jnp.bfloat16)
        y = esrgan_generate_packed({**w, "gc": g, "nf": nf}, img, p)
        return jnp.sum(y[:, 0, 0].astype(jnp.float32))

    return step


def run(tag, pk, g, batch, K=3):
    x = _u8((batch, 1024, 1024, 3))
    t0 = time.time()
    mean, stdev, n = _loop_time(make_step(pk, g), pk, x, k=K, repeats=2)
    print(
        f"{tag:>18}: {mean:7.1f} ms/iter = {batch/(mean/1e3):6.3f} img/s "
        f"(stdev {stdev:.1f}, K={n}, B={batch}) [total {time.time()-t0:.0f}s]",
        flush=True,
    )
    return mean


b1 = run("plain B=1", packed, gc, 1)
# measured 2026-08-17: B=2 = 2495.9 ms (0.801 img/s) vs B=1 1230.6 ms
# (0.813 img/s) — ESRGAN is compute-bound, batching does not amortize
# anything; B=4 OOMs HBM (two 8 GB block-domain tail temps). Skip.

padded = pad_packs_to(packed, gc, nf, 64)
jax.block_until_ready(padded)
# parity check on a small input first
xs = _u8((1, 64, 64, 3))
a = esrgan_generate_packed({**packed, "gc": gc, "nf": nf}, normalize_u8(xs, dtype=jnp.bfloat16), p)
b = esrgan_generate_packed({**padded, "gc": 64, "nf": nf}, normalize_u8(xs, dtype=jnp.bfloat16), p)
d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
print(f"pad64 parity max|delta| = {d:.2e}", flush=True)
assert d < 1e-2, d

p1 = run("pad64 B=1", padded, 64, 1)
if p1 < b1:
    run("pad64 B=2", padded, 64, 2)
    run("pad64 B=4", padded, 64, 4)
