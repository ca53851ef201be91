#!/usr/bin/env python
"""TPU microbench: where does the packed RDB time go?

Times (loop method): single packed RDB, bare conv chain (no epilogues),
and isolated convs at the packed shapes.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, K=16):
    import jax.numpy as jnp

    float(fn(*args, K))
    float(fn(*args, 1))
    def best(k, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (best(K) - best(1)) / (K - 1)


def main():
    import jax
    import jax.numpy as jnp

    from vision_tpu.models.esrgan import EsrganParams, _rdb_packed, esrgan_pack_weights
    from vision_tpu.models.random_weights import random_esrgan_params

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    p = EsrganParams(scale=4, n_blocks=1)
    raw = random_esrgan_params(seed=0, nb=1)
    dev = jax.devices()[0]
    params = {k: jax.device_put(v, dev) for k, v in raw.items()}
    packed = esrgan_pack_weights(params, p, dtype=jnp.bfloat16)
    packs = [pk[0, 0] for pk in packed["rdb_packs"]]
    biases = [b[0, 0] for b in packed["rdb_biases"]]
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, res, res, 64)), jnp.bfloat16) * 0.2

    @partial(jax.jit, static_argnames=("k",))
    def rdb_k(ws, bs, x, k):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            y = _rdb_packed(xi, ws, bs, 32, 64)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)

    t = timeit(rdb_k, packs, biases, x)
    flops = 2 * 9 * 26624 * res * res
    print(f"packed RDB @{res}: {t*1000:.2f} ms  ({flops/t/1e12:.1f} TF/s)", flush=True)

    # bare conv chain: same 5 convs, sequential dependency, no slices/adds
    @partial(jax.jit, static_argnames=("k",))
    def chain_k(ws, x, k):
        def conv(src, w):
            return jax.lax.conv_general_dilated(
                src, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(src.dtype)
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            p0 = conv(xi, ws[0])
            q1 = conv(p0[..., :32], ws[1])
            q2 = conv(q1[..., :32], ws[2])
            q3 = conv(q2[..., :32], ws[3])
            q4 = conv(q3[..., :32], ws[4])
            return acc + jnp.sum(q4.astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, 0.0)

    t = timeit(chain_k, packs, x)
    print(f"bare conv chain @{res}: {t*1000:.2f} ms ({flops/t/1e12:.1f} TF/s)", flush=True)

    # isolated convs at the packed shapes
    shapes = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64), (64, 64), (128, 128), (32, 32), (64, 256), (128, 256)]
    for cin, cout in shapes:
        w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, cin, cout)), jnp.bfloat16) * 0.05
        xi = jnp.asarray(np.random.default_rng(2).standard_normal((1, res, res, cin)), jnp.bfloat16) * 0.2

        @partial(jax.jit, static_argnames=("k",))
        def conv_k(w, xi, k):
            def body(i, acc):
                z = xi + (acc * 0).astype(xi.dtype)
                y = jax.lax.conv_general_dilated(
                    z, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(xi.dtype)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, 0.0)

        t = timeit(conv_k, w, xi, K=32)
        fl = 2 * 9 * cin * cout * res * res
        print(f"conv3x3 {cin:>3}->{cout:<3} @{res}: {t*1000:6.2f} ms ({fl/t/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
