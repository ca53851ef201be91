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
  * mobilesam_encode_1024_img_per_sec — the headline: MobileSAM encoder
    throughput, batch 6 (the measured space-to-batch optimum, NOTES.md
    round-4d). vs_baseline = speedup over the reference's 669 ms/img CPU
    figure.

Methodology (see NOTES.md): the axon tunnel adds a ~27 ms fixed RPC latency
to every dispatch+readback, so the steady-state device time is measured by
running K iterations inside ONE jitted program (serialized through a scalar
dependency) and differencing against a K=1 run. This is the honest per-chip
number a local host would see. The p50 metric takes the median of several
independent loop-differenced estimates.

Artifact discipline (VERDICT r4 #1 — the driver's record IS the
deliverable, reference tests/benchmark.cpp:55-91): the HEADLINE metric runs
FIRST; each metric runs in its own subprocess with a hard deadline
(``VISP_BENCH_METRIC_TIMEOUT``, default 600 s) so one degraded-tunnel hang
cannot eat the rest; every completed metric's JSON line is printed the
moment it lands (flush=True); SIGTERM/SIGINT re-print the best completed
line before exiting so even ``timeout``-killed runs leave a parseable last
line; and the TPU probe ladder's total wall is capped
(``VISP_BENCH_BUDGET``, default 600 s). The parent process never imports
jax — only probe/metric subprocesses touch the tunnel.
"""

from __future__ import annotations

import json
import os
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


def _wait_for_tpu(attempts=4, probe_timeout=240, backoff=30, budget=None):
    """Bounded retry around device enumeration (VERDICT r3 missing #1).

    During an axon tunnel outage (NOTES.md), jax.devices() in a fresh
    process either raises UNAVAILABLE immediately (the round-3 driver run)
    or hangs indefinitely in backend setup. Probing in a subprocess with a
    timeout bounds BOTH failure modes; the parent only initializes its own
    backend after a probe succeeds. ``budget`` (default env
    VISP_BENCH_BUDGET or 600 s) additionally caps the ladder's TOTAL wall —
    the r4 ladder could eat ~44 min of the driver's budget before the first
    metric even started (VERDICT r4 weak #1e). probe_timeout must cover a
    REMOTE compile of the probe matmul on a COLD cache: in the tunnel's
    slow-compile phase even trivial programs take minutes (r5 measured a
    512-matmul compile+readback at 348 s). Two mitigations: the probe
    shares the bench's persistent compile cache (min_compile_time 0, so
    the matmul is cached after its first-ever success and later probes
    pass in seconds, slow phase or not), and the budget caps the ladder.
    """
    import subprocess

    if budget is None:
        budget = float(os.environ.get("VISP_BENCH_BUDGET", "600"))
    t0 = time.monotonic()
    for i in range(attempts):
        probe_timeout = min(probe_timeout, max(budget - (time.monotonic() - t0), 10))
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
                    "import jax, sys; "
                    f"jax.config.update('jax_compilation_cache_dir', {_cache_dir()!r}); "
                    "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0); "
                    "import jax.numpy as jnp; "
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
            if time.monotonic() - t0 + backoff >= budget:
                print(
                    f"bench: TPU tunnel unavailable ({why}); probe budget "
                    f"({budget:.0f}s) exhausted",
                    file=sys.stderr, flush=True,
                )
                return False
            print(
                f"bench: TPU tunnel unavailable ({why}); retry "
                f"{i + 1}/{attempts - 1} in {backoff}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(backoff)
    return False


# HEADLINE FIRST: a driver timeout mid-run must still have captured the
# metric that matters (VERDICT r4 #1a). The driver parses the LAST stdout
# line; _emit_final re-prints the best completed line on every exit path.
METRICS = (
    ("encode", bench_sam_encode),
    ("mask", bench_sam_mask_p50),
    ("esrgan", bench_esrgan),
)
_PRIORITY = [name for name, _ in METRICS]


def _cache_dir() -> str:
    d = os.environ.get(
        "VISP_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _run_child(name: str) -> None:
    """Child mode: run ONE metric in-process and print its JSON line.

    Isolated per metric so a degraded-phase hang (NOTES r4e: 'enumeration
    260 s, all compute hung >25 min') dies with this process's deadline
    instead of eating the remaining metrics (VERDICT r4 #1d)."""
    fake = os.environ.get("VISP_BENCH_FAKE")
    if fake:
        # test hook (tests/test_bench_harness.py): scripted per-metric
        # outcomes so the partial-output/deadline/SIGTERM paths are provable
        # without a tunnel. 'ok' prints a stub line, 'hang' sleeps forever,
        # 'fail' exits nonzero.
        mode = dict(
            kv.split(":") for kv in fake.split(",") if ":" in kv
        ).get(name, "ok")
        if mode == "hang":
            while True:
                time.sleep(3600)
        if mode == "fail":
            sys.exit(7)
        print(json.dumps({"metric": f"fake_{name}", "value": 1.0, "unit": "x", "vs_baseline": 1.0}), flush=True)
        return
    import jax

    cache_dir = _cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    fn = dict(METRICS)[name]
    print(json.dumps(fn()), flush=True)


def _best_line(results: dict) -> str | None:
    for name in _PRIORITY:
        if name in results:
            return results[name]
    return None


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        _run_child(sys.argv[2])
        return

    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only is not None and only not in ("all", "esrgan", "mask", "encode"):
        print(
            f"bench: unknown selector {only!r} (use esrgan, mask, encode, or all)",
            file=sys.stderr,
        )
        sys.exit(2)

    import signal
    import subprocess
    import threading

    metric_timeout = float(os.environ.get("VISP_BENCH_METRIC_TIMEOUT", "600"))
    results: dict[str, str] = {}  # name -> printed JSON line
    active: list = [None]  # the currently-running child, for the signal path
    finalized = threading.Event()

    def _emit_final() -> None:
        # the driver's last-line parse must always see a metric: re-print
        # the highest-priority completed line as the FINAL line (r4 #1b/#1c)
        if finalized.is_set():
            return
        finalized.set()
        line = _best_line(results)
        if line is not None:
            print(line, flush=True)

    def _on_signal(signum, frame):
        # `timeout`'s SIGTERM (rc=124) killed r3+r4's fully-computed results
        # unprinted; flush what completed, then exit without running any
        # more Python (the interpreter may be mid-anything)
        child = active[0]
        if child is not None:
            try:
                child.kill()
            except Exception:  # noqa: BLE001
                pass
        print(f"# bench: signal {signum}; flushing completed metrics", file=sys.stderr, flush=True)
        _emit_final()
        sys.stdout.flush()
        os._exit(0 if results else 1)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    if not os.environ.get("VISP_BENCH_FAKE") and not _wait_for_tpu():
        print(
            "bench: TPU tunnel unavailable after bounded retries; giving up",
            file=sys.stderr,
        )
        sys.exit(1)

    for name, _fn in METRICS:
        if only and only != "all" and name != only:
            continue
        t0 = time.monotonic()
        print(
            f"# bench {name} starting (deadline {metric_timeout:.0f}s)",
            file=sys.stderr, flush=True,
        )
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--run", name],
            stdout=subprocess.PIPE,
            text=True,  # stderr inherits: child narration reaches the log live
        )
        active[0] = proc
        lines: list[str] = []

        def _reader(stream=proc.stdout, sink=lines):
            for ln in stream:
                sink.append(ln.rstrip("\n"))

        th = threading.Thread(target=_reader, daemon=True)
        th.start()
        killed = False
        try:
            proc.wait(timeout=metric_timeout)
        except subprocess.TimeoutExpired:
            killed = True
            proc.kill()
            proc.wait()
            print(
                f"# bench {name} exceeded its {metric_timeout:.0f}s deadline; "
                "killed (degraded tunnel? see NOTES.md) — continuing",
                file=sys.stderr, flush=True,
            )
        active[0] = None
        th.join(timeout=10)
        took = time.monotonic() - t0
        got = [ln for ln in lines if ln.startswith("{")]
        if got:
            # print the moment it completes (r4 #1b): a later hang or
            # driver timeout can no longer lose this result
            results[name] = got[-1]
            print(got[-1], flush=True)
            print(f"# bench {name} done in {took:.0f}s", file=sys.stderr, flush=True)
        elif not killed and proc.returncode not in (None, 0):
            print(
                f"# bench {name} failed rc={proc.returncode} after {took:.0f}s",
                file=sys.stderr, flush=True,
            )

    _emit_final()
    sys.exit(0 if results else 1)


if __name__ == "__main__":
    main()
