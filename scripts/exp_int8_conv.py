#!/usr/bin/env python
"""Probe: int8 conv rates on v5e at ESRGAN shapes.

ESRGAN's plateau is gc=32 channels: bf16 activations tile (8,128) so Cin=32
underfills the contraction sublanes AND the MXU runs at its bf16 rate.
int8 tiles are (32,128) — Cin=32 exactly fills a sublane tile — and the
v5e MXU's int8 rate is ~2x bf16. If XLA lowers int8 convs well, this is
the only remaining lever for the RRDB trunk. Measures conv GFLOP/s for
bf16 vs int8xint8->int32 at the trunk shapes."""
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

from vision_tpu.core.device import backend_init

dev = backend_init()
print(f"device={dev.jax_device}", flush=True)

RES = 1024
rng = np.random.default_rng(0)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32,
    )


@partial(jax.jit, static_argnames=("k",))
def run_k(x, w, k):
    cin = x.shape[-1]

    def body(i, carry):
        acc, xx = carry
        y = conv(xx, w)
        # feed the output back as the next input: a REAL data dependence
        # (a `probe * 0` feedback gets constant-folded and the conv hoisted
        # out of the loop — the first version of this probe measured
        # negative times that way)
        nxt = y[..., :cin]
        if x.dtype == jnp.int8:
            xx = nxt.astype(jnp.int8)  # wraparound is fine for timing
        else:
            xx = (nxt * 0.001).astype(x.dtype)  # keep magnitudes finite
        return acc + y[0, 0, 0, 0].astype(jnp.float32), xx

    out, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0), x))
    return out


for cin, cout in ((32, 32), (32, 192), (64, 64), (64, 192), (128, 128)):
    flops = 2 * RES * RES * cin * cout * 9
    for dt, wdt in ((jnp.bfloat16, jnp.bfloat16), (jnp.int8, jnp.int8)):
        x = jnp.asarray(rng.integers(-3, 3, (1, RES, RES, cin)), dt)
        w = jnp.asarray(rng.integers(-3, 3, (3, 3, cin, cout)), wdt)
        K = 16
        try:
            float(run_k(x, w, K))
            float(run_k(x, w, 1))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_k(x, w, K))
                ts.append(time.perf_counter() - t0)
            t1s = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_k(x, w, 1))
                t1s.append(time.perf_counter() - t0)
            per = (min(ts) - min(t1s)) / (K - 1)
            print(
                f"{cin:>4}->{cout:<4} {np.dtype(dt).name:>8}: {per*1e3:7.2f} ms"
                f"  = {flops/per/1e12:6.1f} TF/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{cin:>4}->{cout:<4} {np.dtype(dt).name:>8}: FAILED {type(e).__name__}: {e}", flush=True)
