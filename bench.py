#!/usr/bin/env python
"""Benchmark harness — prints one JSON line per north-star metric.

The three metrics named by BASELINE.md:41 (from BASELINE.json):

  * esrgan_4x_1024_img_per_sec — Real-ESRGAN 4x whole-image throughput at
    1024², batched (the reference's tiled workload, vision.cpp:220-253).
    vs_baseline = speedup over torch-CPU-eager RRDBNet-23 (measured on this
    machine, the closest proxy for the reference's CPU ggml engine — the
    two are within ~10% on every workload the reference publishes).
  * sam_mask_p50_ms — p50 single-mask latency: u8 image -> normalize ->
    TinyViT encode -> point prompt encode -> mask decode -> on-device
    best-mask argmax (reference end-to-end path, vision.cpp:36-95).
    vs_baseline = reference CPU encoder time (669 ms, README.md:205-210;
    its decode adds <2 ms) over our p50.
  * mobilesam_encode_1024_img_per_sec — the headline (printed LAST so the
    driver's single-line parse keeps the historical metric): MobileSAM
    encoder throughput, batch 6 (the measured space-to-batch optimum,
    NOTES.md round-4d). vs_baseline = speedup over the reference's
    669 ms/img CPU figure.

Methodology (see NOTES.md): the axon tunnel adds a ~27 ms fixed RPC latency
to every dispatch+readback, so the steady-state device time is measured by
running K iterations inside ONE jitted program (serialized through a scalar
dependency) and differencing against a K=1 run. This is the honest per-chip
number a local host would see. The p50 metric takes the median of several
independent loop-differenced estimates.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

# ESRGAN 4x @1024^2 CPU baseline (the reference publishes none): 450 s on
# the reference's Ryzen 5600X, derived two independent ways (NOTES.md r3):
#  * torch-CPU-eager RRDBNet-23 measured 2693 s on this box's single core,
#    linearly scaled to the reference's 6 cores -> ~449 s;
#  * exact workload FLOPs (37.6 TFLOP) / the ggml CPU throughput implied by
#    the reference's own MobileSAM row (40 GFLOP / 0.669 s = 60 GFLOP/s)
#    -> ~630 s. The smaller (less flattering) anchor is used.
ESRGAN_CPU_BASELINE_S = 450.0
SAM_CPU_BASELINE_MS = 669.0  # reference CPU MobileSAM (README.md:205-210)


def _loop_method(encode_k, params, x, K, repeats=3):
    """(t_K - t_1) / (K - 1) with best-of-n timing."""

    def best_of(k, n=repeats):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(encode_k(params, x, k))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_k = best_of(K)
    t_1 = best_of(1)
    return max((t_k - t_1) / (K - 1), 1e-6)


def _loop_method_median(encode_k, params, x, K, estimates=5, repeats=2):
    """Median of several independent loop-differenced estimates.

    A single (t_K - t_1) difference is fragile when the axon tunnel is in a
    degraded phase: one multi-second readback stall landing inside either
    sample skews the whole metric (a 03:04 round-4e driver-log run read
    encode at 180 img/s against a 273-296 healthy range this way). The
    median of independent estimates rejects such outliers the same way the
    p50 mask metric already does; on a healthy tunnel all estimates agree
    to ~1% and the cost is a few extra seconds.
    """
    samples = sorted(
        _loop_method(encode_k, params, x, K, repeats=repeats) for _ in range(estimates)
    )
    spread = samples[-1] / max(samples[0], 1e-9)
    if spread > 1.3:
        print(
            f"# bench: high estimate spread ({spread:.2f}x across {estimates} "
            "loop-differenced samples) — tunnel jitter suspected; median reported",
            file=sys.stderr, flush=True,
        )
    return samples[len(samples) // 2]


def bench_sam_encode(batch=6, K=11):
    # batch=6 is the measured optimum (289.8 img/s vs 273.1 at b4, round-4d
    # knee probe): XLA's space-to-batch converter rewrites the high-res stem
    # convs into deep-batch small-spatial form only below batch 8; b6 keeps
    # that regime with better weight amortization, b8 falls off the cliff
    # (537 MB f32 conv temps, 255 img/s). See NOTES.md round-4d.
    import jax
    import jax.numpy as jnp

    from vision_tpu.core.params import Params
    from vision_tpu.models.mobile_sam import sam_encode_image
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

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

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, 1024, 1024, 3), dtype=np.uint8)
    )
    float(encode_k(params, x, K))  # compile + warm
    float(encode_k(params, x, 1))
    per_iter = _loop_method_median(encode_k, params, x, K)
    imgs_per_sec = batch / per_iter
    return {
        "metric": "mobilesam_encode_1024_img_per_sec",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / (1000.0 / SAM_CPU_BASELINE_MS), 2),
    }


def bench_sam_mask_p50(K=16, estimates=9):
    """p50 single-mask latency: full encode+prompt+decode+best-mask program."""
    import jax
    import jax.numpy as jnp

    from vision_tpu.core.params import Params
    from vision_tpu.models.mobile_sam import (
        sam_encode_image,
        sam_encode_points,
        sam_predict_mask,
    )
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    raw = random_mobile_sam_params(seed=0)
    dev = jax.devices()[0]
    params = {
        k: jax.device_put(v, dev).astype(jnp.bfloat16 if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }
    coords = jnp.asarray(np.array([[0.1, 0.2], [0.0, 0.0]], np.float32))

    @partial(jax.jit, static_argnames=("k",))
    def mask_k(weights, x, k):
        pp = Params(weights)

        def body(i, acc):
            img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, jnp.bfloat16)
            img = img + (acc * 0).astype(img.dtype)  # serialize iterations
            embed = sam_encode_image(pp, img, flash=True)
            pred = sam_predict_mask(pp, embed, sam_encode_points(pp, coords))
            # on-device best-mask selection (reference argmax-IoU,
            # vision.cpp:80-84)
            idx = jnp.argmax(pred.iou[0, :3])
            return acc + jnp.sum(pred.masks[0, idx].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, 0.0)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 1024, 1024, 3), dtype=np.uint8))
    float(mask_k(params, x, K))  # compile + warm
    float(mask_k(params, x, 1))
    samples = sorted(_loop_method(mask_k, params, x, K, repeats=1) for _ in range(estimates))
    p50_ms = samples[len(samples) // 2] * 1000.0
    return {
        "metric": "sam_mask_p50_ms",
        "value": round(p50_ms, 2),
        "unit": "ms",
        "vs_baseline": round(SAM_CPU_BASELINE_MS / p50_ms, 2),
    }


def bench_esrgan(batch=1, K=3, res=1024):
    """Whole-image 4x RRDBNet-23 throughput, batched (VERDICT r2 #3)."""
    import jax
    import jax.numpy as jnp

    from vision_tpu.models.esrgan import (
        EsrganParams,
        esrgan_generate_packed,
        esrgan_pack_weights,
    )
    from vision_tpu.models.random_weights import random_esrgan_params
    from vision_tpu.ops.preprocess import normalize_u8

    raw = random_esrgan_params(0)
    dev = jax.devices()[0]
    dev_params = {k: jax.device_put(v, dev) for k, v in raw.items()}
    p = EsrganParams(4, 23)
    packed = esrgan_pack_weights(dev_params, p, dtype=jnp.bfloat16)
    gc, nf = packed.pop("gc"), packed.pop("nf")

    @partial(jax.jit, static_argnames=("k",))
    def run_k(w, x, k):
        def body(i, acc):
            xi = x + (acc * 0).astype(x.dtype)
            img = normalize_u8(xi, dtype=jnp.bfloat16)
            y = esrgan_generate_packed({**w, "gc": gc, "nf": nf}, img, p)
            return acc + jnp.sum(y[0, 0, 0].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, 0.0)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (batch, res, res, 3), dtype=np.uint8))
    float(run_k(packed, x, K))  # compile + warm
    float(run_k(packed, x, 1))
    per_iter = _loop_method(run_k, packed, x, K, repeats=2)
    imgs_per_sec = batch / per_iter
    out = {
        "metric": "esrgan_4x_1024_img_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
    }
    if ESRGAN_CPU_BASELINE_S:
        out["vs_baseline"] = round(imgs_per_sec * ESRGAN_CPU_BASELINE_S, 2)
    return out


def _wait_for_tpu(attempts=4, probe_timeout=360, backoff=300):
    """Bounded retry around device enumeration (VERDICT r3 missing #1).

    During an axon tunnel outage (NOTES.md), jax.devices() in a fresh
    process either raises UNAVAILABLE immediately (the round-3 driver run)
    or hangs indefinitely in backend setup. Probing in a subprocess with a
    timeout bounds BOTH failure modes; the parent only initializes its own
    backend after a probe succeeds. Worst case ~30 min before giving up —
    long enough to ride out a transient blip, bounded so the driver's log
    shows a clear failure instead of a silent stall.
    """
    import subprocess

    for i in range(attempts):
        try:
            # Require an actual TPU device AND a completed compute+readback:
            # (a) during some outage modes the plugin soft-fails and jax
            # silently falls back to CPU, which would "pass" a bare
            # jax.devices() probe and let the bench run on this box's one
            # CPU core, emitting wrong numbers as TPU; (b) round-4e observed
            # a degraded phase where enumeration succeeds (260 s) but any
            # dispatch+readback hangs indefinitely — an enumeration-only
            # probe would green-light a bench that then stalls forever.
            rc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, sys; import jax.numpy as jnp; "
                    "tpu = lambda d: d.platform.lower() == 'tpu' or "
                    "'tpu' in str(getattr(d, 'device_kind', '')).lower(); "
                    "ok = any(tpu(d) for d in jax.devices()); "
                    "x = jnp.ones((512, 512), jnp.bfloat16); "
                    "ok = ok and float(jnp.sum(x @ x)) > 0; "
                    "sys.exit(0 if ok else 3)",
                ],
                timeout=probe_timeout,
                capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = None
        if rc == 0:
            return True
        if i < attempts - 1:
            why = (
                "probe hung"
                if rc is None
                else "no TPU device (CPU fallback)" if rc == 3 else f"probe rc={rc}"
            )
            print(
                f"bench: TPU tunnel unavailable ({why}); retry "
                f"{i + 1}/{attempts - 1} in {backoff}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(backoff)
    return False


def main() -> None:
    import os

    import jax

    # persistent compilation cache: the encoder programs compile in minutes
    # over the remote-compile tunnel; cache them across bench invocations
    # (VISP_COMPILE_CACHE overrides the location)
    cache_dir = os.environ.get(
        "VISP_COMPILE_CACHE", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not _wait_for_tpu():
        print(
            "bench: TPU tunnel unavailable after bounded retries; giving up",
            file=sys.stderr,
        )
        sys.exit(1)

    # the probe said the tunnel is up, but enumeration in THIS process can
    # still stall for minutes; say WHY on stderr so a stalled bench is
    # diagnosable from its log
    import threading
    import time as _time

    devices_up = threading.Event()

    def _watchdog():
        t0 = _time.time()
        while not devices_up.wait(60):
            print(
                f"bench: still waiting for device enumeration after "
                f"{_time.time() - t0:.0f}s (TPU tunnel outage? see NOTES.md)",
                file=sys.stderr, flush=True,
            )

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()
    devices_up.set()

    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only is not None and only not in ("all", "esrgan", "mask", "encode"):
        print(
            f"bench: unknown selector {only!r} (use esrgan, mask, encode, or all)",
            file=sys.stderr,
        )
        sys.exit(2)
    results = []
    # headline LAST: the driver parses the final JSON line
    for name, fn in (
        ("esrgan", bench_esrgan),
        ("mask", bench_sam_mask_p50),
        ("encode", bench_sam_encode),
    ):
        if only and only != "all" and name != only:
            continue
        try:
            results.append(fn())
        except Exception as e:  # noqa: BLE001 — one failing bench must not kill the rest
            print(f"# bench {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
