#!/usr/bin/env python
"""BiRefNet swin-T 1024^2 breakdown with the shift deform (round-2)."""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vision_tpu.core.params import Params
from vision_tpu.models.birefnet import (
    BirefnetParams,
    basic_decoder_block,
    birefnet_predict,
    decode,
    encode,
)
from vision_tpu.models.random_weights import random_birefnet_params
from vision_tpu.models.swin import SWIN_T_PARAMS


def timeit(step, args, K=8):
    @partial(jax.jit, static_argnames=("kk",))
    def run(args, kk):
        def body(i, acc):
            a0 = args[0] + (acc * 0).astype(args[0].dtype)
            return acc + jnp.sum(step(a0, *args[1:]).astype(jnp.float32))
        return jax.lax.fori_loop(0, kk, body, 0.0)

    float(run(args, K)); float(run(args, 1))
    def best(kk, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(run(args, kk)); ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


def main():
    dev = jax.devices()[0]
    raw = random_birefnet_params("tiny")
    params = {k: jax.device_put(v, dev).astype(jnp.bfloat16 if v.dtype == np.float32 else v.dtype) for k, v in raw.items()}
    p = BirefnetParams(image_size=1024, image_extent=(1024, 1024), encoder=SWIN_T_PARAMS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1024, 1024, 3)), jnp.bfloat16) * 0.5

    t = timeit(lambda xi, w: birefnet_predict(Params(w), xi, p, flash=True, deform_bound=2), (x, params))
    print(f"full: {t*1000:.1f} ms", flush=True)

    t = timeit(lambda xi, w: jnp.concatenate([f.reshape(1, -1)[:, :8] for f in encode(Params(w), xi, p.encoder, True)], 1), (x, params))
    print(f"encode (dual-scale swin): {t*1000:.1f} ms", flush=True)

    # decoder alone with frozen features
    feats = jax.jit(lambda w, xi: [jnp.asarray(f) for f in encode(Params(w), xi, p.encoder, True)])(params, x)

    def dec(xi, w, f0, f1, f2, f3):
        fs = [f0, f1, f2, f3]
        fs[3] = basic_decoder_block(Params(w)["squeeze_module"][0], fs[3], 2)
        return decode(Params(w)["decoder"], xi, fs, 2)

    t = timeit(dec, (x, params, *feats))
    print(f"decode (shift deform): {t*1000:.1f} ms", flush=True)

    def dec_nodeform(xi, w, f0, f1, f2, f3):
        fs = [f0, f1, f2, f3]
        fs[3] = basic_decoder_block(Params(w)["squeeze_module"][0], fs[3], 0)  # bound 0: 4 windows
        return decode(Params(w)["decoder"], xi, fs, 0)

    t = timeit(dec_nodeform, (x, params, *feats))
    print(f"decode (bound=0 deform, lower bound): {t*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
