"""A/B: int8-resident weights (core/quant.py) vs expanded bf16 on real TPU.

Question: does halving weight HBM bytes (dequant fused into consumers)
speed up weight-streaming-sensitive workloads, or does the in-graph
dequant cost more than the bandwidth it saves?

Workloads:
  - SAM encode 1024, batch 1 and 4 (per-tensor weights; the batch-4 win in
    round 2 was attributed to weight-streaming amortization, so batch 1
    should be the streaming-bound case)
  - SAM3 vision 1008 (scan trunk; quantized variant dequantizes the whole
    window stack before the scan — an HBM round-trip — plus per-tensor
    residency for embeddings/globals/neck)

Method: loop-differencing (see vision_tpu/benchmark.py docstring).
"""

import statistics
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from vision_tpu.core.device import backend_init
from vision_tpu.core.params import Params
from vision_tpu.core.quant import is_quant, quantize_store, store_nbytes


def loop_time(step, params, x, k=8, repeats=3):
    @partial(jax.jit, static_argnames=("kk",))
    def run_k(w, xx, kk):
        def body(i, acc):
            xi = xx + (acc * 0).astype(xx.dtype)
            return acc + step(w, xi)

        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

    float(run_k(params, x, k))
    float(run_k(params, x, 1))

    def best(kk, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(run_k(params, x, kk))
            ts.append(time.perf_counter() - t0)
        return ts

    t1 = min(best(1, repeats))
    diffs = [(t - t1) / (k - 1) * 1000.0 for t in best(k, repeats)]
    return statistics.mean(diffs), (statistics.stdev(diffs) if len(diffs) > 1 else 0.0)


def put_store(store, dev, dtype):
    out = {}
    for kk, v in store.items():
        if is_quant(v):
            out[kk] = v.astype(dtype).put(dev.jax_device)
        else:
            a = jax.device_put(v, dev.jax_device)
            if (
                np.asarray(v).dtype == np.float32
                and "positional" not in kk
                and "position_embeddings" not in kk
            ):
                a = a.astype(dtype)
            out[kk] = a
    return out


def mb(n):
    return n / 1e6


def main():
    dev = backend_init()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # ---------------- SAM encode ----------------
    from vision_tpu.models.mobile_sam import sam_encode_image
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    raw = random_mobile_sam_params(0)
    plain = put_store(raw, dev, dtype)
    quant = put_store(quantize_store(raw, dtype="bfloat16"), dev, dtype)
    print(
        f"sam store: plain {mb(store_nbytes(plain)):.1f} MB, "
        f"resident {mb(store_nbytes(quant)):.1f} MB"
    )

    def enc_step(w, x):
        img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return jnp.sum(sam_encode_image(Params(w), img, flash=True).astype(jnp.float32))

    for b in (1, 4):
        x = jnp.asarray(rng.integers(0, 256, (b, 1024, 1024, 3), dtype=np.uint8))
        for name, store in (("bf16", plain), ("int8res", quant)):
            m, s = loop_time(enc_step, store, x)
            print(f"sam-encode b{b} {name}: {m:.2f} ± {s:.2f} ms "
                  f"({b * 1000.0 / m:.1f} img/s)")

    # ---------------- SAM3 vision ----------------
    from vision_tpu.models.random_weights import random_sam3_vision_params
    from vision_tpu.models.sam3 import Sam3VitParams, encode_vision, sam3_pack_vision_weights

    p = Sam3VitParams()
    raw3 = random_sam3_vision_params()

    def build_sam3(quantize):
        if not quantize:
            params = {}
            for kk, v in raw3.items():
                a = jax.device_put(v, dev.jax_device)
                if v.dtype == np.float32 and "position_embeddings" not in kk:
                    a = a.astype(dtype)
                params[kk] = a
            return {"p": params, "s": sam3_pack_vision_weights(params, p)}
        # quantize HOST-side (never D2H a device store over the tunnel):
        # reproduce the window-stack with numpy, then quantize both dicts
        from vision_tpu.models.sam3 import _SAM3_LAYER_LEAVES

        win_idx = tuple(i for i in range(p.n_layers) if i not in p.global_attn_indexes)
        host_stack = {
            leaf: np.stack([raw3[f"backbone.layers.{i}.{leaf}"] for i in win_idx])
            for leaf in _SAM3_LAYER_LEAVES
        }
        params = put_store(
            quantize_store(raw3, dtype="bfloat16", skip=("position_embeddings",)), dev, dtype
        )
        stack = put_store(quantize_store(host_stack, dtype="bfloat16"), dev, dtype)
        return {"p": params, "s": stack}

    def sam3_step(w, x):
        img = x.astype(dtype) / 127.5 - 1.0
        stack = {k: (v.dequant() if is_quant(v) else v) for k, v in w["s"].items()}
        out = encode_vision(Params(w["p"]), img, p, flash=True, win_stack=stack)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)

    x3 = jnp.asarray(rng.integers(0, 256, (1, 1008, 1008, 3), dtype=np.uint8))
    for name, quantize in (("bf16", False), ("int8res", True)):
        w = build_sam3(quantize)
        nb = store_nbytes(w["p"]) + store_nbytes(w["s"])
        m, s = loop_time(sam3_step, w, x3)
        print(f"sam3-vision-1008 {name}: {m:.2f} ± {s:.2f} ms (store {mb(nb):.1f} MB)")


if __name__ == "__main__":
    main()
