#!/usr/bin/env python
"""Root-cause the SAM encode batch knee (VERDICT r3 next #4).

Measured round-3c: 273 img/s at batch 4 but 224-240 at batch 8 and 227 at
batch 16 — throughput DROPPING with batch on a compute-bound ViT is
anomalous. This probe pairs the loop-method timing with the compiled
program's own accounting at each batch size:

  * cost_analysis()    — flops / bytes-accessed per image: a jump in
                         bytes/img at b8 means weights or activations
                         started re-streaming (remat or fusion break);
  * memory_analysis()  — temp allocation: a superlinear jump means VMEM
                         spill into HBM scratch.

Usage: python scripts/exp_sam_knee.py [batches...]   (default 1 2 4 8 16)
EXP_TINY=1 runs a reduced geometry on CPU to validate the harness.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TINY = os.environ.get("EXP_TINY") == "1"
if TINY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vision_tpu.benchmark import _loop_time, _u8
from vision_tpu.core.device import backend_init
from vision_tpu.core.params import Params
from vision_tpu.models.mobile_sam import sam_encode_image
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

dev = backend_init()
dtype = dev.preferred_float_type
SIZE = 1024  # mobile-sam's fixed encoder geometry; TINY shrinks the
# timing loop (k=2) and batch list instead of the image

raw = random_mobile_sam_params(0)
params = {
    k: jax.device_put(v, dev.jax_device).astype(dtype if v.dtype == np.float32 else v.dtype)
    for k, v in raw.items()
}


def step(w, x):
    img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dtype)
    return jnp.sum(sam_encode_image(Params(w), img, flash=True).astype(jnp.float32))


def fmt_bytes(n):
    return f"{n / 1e9:7.2f} GB" if n > 1e9 else f"{n / 1e6:7.1f} MB"


def main(batches):
    rows = []
    for b in batches:
        x = _u8((b, SIZE, SIZE, 3))
        lowered = jax.jit(step).lower(params, x)
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        flops = bytes_acc = float("nan")
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = ca.get("flops", float("nan"))
            bytes_acc = ca.get("bytes accessed", float("nan"))
        except Exception as e:  # noqa: BLE001 - backend may not expose it
            print(f"  b={b}: cost_analysis unavailable: {e}", flush=True)
        temp = arg = out_b = code = float("nan")
        try:
            ma = compiled.memory_analysis()
            temp = ma.temp_size_in_bytes
            arg = ma.argument_size_in_bytes
            out_b = ma.output_size_in_bytes
            code = ma.generated_code_size_in_bytes
        except Exception as e:  # noqa: BLE001
            print(f"  b={b}: memory_analysis unavailable: {e}", flush=True)
        if TINY:
            m, s, _ = _loop_time(step, params, x, k=2, repeats=2)
        else:
            m, s, _ = _loop_time(step, params, x, k=max(2, 16 // b), repeats=3)
        ips = b / (m / 1000.0)
        rows.append((b, m, s, ips, flops, bytes_acc, temp, arg, out_b, code))
        print(
            f"b={b:2d}  {m:8.2f} ms/iter (sd {s:5.2f})  {ips:6.1f} img/s  "
            f"compile {compile_s:5.1f}s", flush=True,
        )
        if flops == flops:
            print(
                f"      flops/img {flops / b / 1e9:7.2f} G   "
                f"bytes/img {fmt_bytes(bytes_acc / b)}   "
                f"temp {fmt_bytes(temp)}   args {fmt_bytes(arg)}   "
                f"code {fmt_bytes(code)}", flush=True,
            )
    print("\nsummary (img-normalized):")
    base = rows[0]
    for r in rows:
        b, m, s, ips, flops, bytes_acc, temp, *_ = r
        rel_bytes = bytes_acc / b / (base[5] / base[0]) if base[5] == base[5] else float("nan")
        print(
            f"  b={b:2d}: {ips:6.1f} img/s  bytes/img x{rel_bytes:5.2f}  "
            f"temp x{temp / base[6] if base[6] else float('nan'):5.2f}", flush=True,
        )


if __name__ == "__main__":
    bs = [int(a) for a in sys.argv[1:]] or ([1] if TINY else [1, 2, 4, 8, 16])
    main(bs)
