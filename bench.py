#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: MobileSAM image-encoder throughput at 1024x1024 bf16 on one chip
(the reference's hero workload: README.md perf table, 669 ms/img on its CPU
baseline). vs_baseline = speedup over that 669 ms/img figure.

Methodology (see NOTES.md): the axon tunnel adds a ~27 ms fixed RPC latency
to every dispatch+readback, so the steady-state device time is measured by
running K encoder iterations inside ONE jitted program (serialized through a
scalar dependency) and differencing against a K=1 run. This is the honest
per-chip throughput a local host would see.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the encoder programs compile in minutes
    # over the remote-compile tunnel; cache them across bench invocations
    # (VISP_COMPILE_CACHE overrides the location)
    cache_dir = os.environ.get(
        "VISP_COMPILE_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vision_tpu.core.params import Params
    from vision_tpu.models.mobile_sam import sam_encode_image
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    raw = random_mobile_sam_params(seed=0)
    dev = jax.devices()[0]
    params = {
        k: jax.device_put(v, dev).astype(jnp.bfloat16 if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }

    @partial(jax.jit, static_argnames=("k",))
    def encode_k(weights, x, k):
        def body(i, acc):
            img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, jnp.bfloat16)
            img = img + (acc * 0).astype(img.dtype)  # serialize iterations
            # flash=True matches the production SamModel path (device.flags
            # enables flash_attention on TPU, core/device.py:83)
            e = sam_encode_image(Params(weights), img, flash=True)
            return acc + jnp.sum(e.astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, 0.0)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (batch, 1024, 1024, 3), dtype=np.uint8))

    # compile + warmup both programs
    float(encode_k(params, x, K))
    float(encode_k(params, x, 1))

    def best_of(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(encode_k(params, x, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_k = best_of(K)
    t_1 = best_of(1)
    per_iter = max((t_k - t_1) / (K - 1), 1e-6)
    imgs_per_sec = batch / per_iter

    baseline_imgs_per_sec = 1000.0 / 669.0  # reference CPU MobileSAM (README.md:205-210)
    print(
        json.dumps(
            {
                "metric": "mobilesam_encode_1024_img_per_sec",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / baseline_imgs_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
