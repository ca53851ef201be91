#!/usr/bin/env python
"""TPU experiment: packed (split-contribution + scan) RRDBNet-23 at 1024^2.

Loop-differencing method (NOTES.md): K iterations inside one jitted
fori_loop, minus the K=1 run, divided by K-1.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vision_tpu.models.esrgan import (EsrganParams, esrgan_generate_packed, esrgan_pack_weights,
        esrgan_generate_s2d, esrgan_pack_weights_s2d)
    from vision_tpu.models.random_weights import random_esrgan_params

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    mode = sys.argv[4] if len(sys.argv) > 4 else "packed"

    p = EsrganParams(scale=4, n_blocks=23)
    print("building params...", flush=True)
    raw = random_esrgan_params(seed=0)
    dev = jax.devices()[0]
    params = {k: jax.device_put(v, dev) for k, v in raw.items()}
    t0 = time.perf_counter()
    pack_fn = esrgan_pack_weights_s2d if mode == "s2d" else esrgan_pack_weights
    gen_fn = esrgan_generate_s2d if mode == "s2d" else esrgan_generate_packed
    packed = pack_fn(params, p, dtype=jnp.bfloat16)
    pk = dict(packed)
    gc, nf = pk.pop("gc"), pk.pop("nf")
    print(f"packed in {time.perf_counter()-t0:.1f}s", flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def run_k(weights, x, k):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            y = gen_fn({**weights, "gc": gc, "nf": nf}, xi, p)
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, 0.0)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 3)).astype(np.float32) * 0.2
    ).astype(jnp.bfloat16)

    t0 = time.perf_counter()
    v = float(run_k(pk, x, K))
    print(f"K={K} compile+run {time.perf_counter()-t0:.1f}s  val={v:.3f}", flush=True)
    t0 = time.perf_counter()
    float(run_k(pk, x, 1))
    print(f"K=1 compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    def best_of(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run_k(pk, x, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_k, t_1 = best_of(K), best_of(1)
    per = (t_k - t_1) / (K - 1)
    # trunk FLOPs: 23 RRDB * 3 RDB * 2*9*(nf*192 + gc*(160+128+96+64)) per px
    px = batch * res * res
    rdb_flops = 2 * 9 * (64 * 192 + 32 * (160 + 128 + 96 + 64)) * px
    total = 69 * rdb_flops + 2 * 9 * 64 * 64 * px * 2  # + stem/trunk approx
    print(
        f"{mode} batch={batch} res={res}: {per*1000:.0f} ms/iter "
        f"({per*1000/batch:.0f} ms/img, {total/per/1e12:.1f} TF/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
