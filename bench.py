#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: MobileSAM image-encoder throughput at 1024x1024 bf16 on one chip
(the reference's hero workload: README.md perf table, 669 ms/img on its CPU
baseline). vs_baseline = speedup over that 669 ms/img figure.

Timing notes (see NOTES.md): under the axon tunnel `block_until_ready` does
not block, so every timed iteration forces a scalar readback — the honest
end-to-end cost of a request whose embedding stays on device.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vision_tpu.core.params import Params
    from vision_tpu.models.mobile_sam import sam_encode_image
    from vision_tpu.models.random_weights import random_mobile_sam_params

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    raw = random_mobile_sam_params(seed=0)
    dev = jax.devices()[0]
    params = {
        k: jax.device_put(v, dev).astype(jnp.bfloat16 if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }

    @jax.jit
    def encode_sum(weights, x):
        return jnp.sum(sam_encode_image(Params(weights), x).astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).random((batch, 1024, 1024, 3)), jnp.bfloat16)

    # compile + warmup
    float(encode_sum(params, x))
    float(encode_sum(params, x))

    iters, t_total = 0, 0.0
    deadline = time.time() + 10.0
    best = float("inf")
    while time.time() < deadline and iters < 50:
        t0 = time.perf_counter()
        float(encode_sum(params, x))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        t_total += dt
        iters += 1

    imgs_per_sec = batch / (t_total / iters)
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
