#!/usr/bin/env python
"""SamServer end-to-end serving throughput on the real chip.

Submits N concurrent (image, point) requests through the batching queue and
reports requests/sec + batch occupancy. NOTE: on this dev environment every
batch dispatch pays the ~27 ms tunnel RPC floor (NOTES.md) on top of the
~15 ms batch-4 device compute — production on a local host would see only
the device time.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vision_tpu.core.device import backend_init
from vision_tpu.image import image_load_array
from vision_tpu.models.mobile_sam import SamModel, SamParams
from vision_tpu.models.random_weights import random_mobile_sam_params
from vision_tpu.serve import SamServer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

dev = backend_init()
raw = random_mobile_sam_params(seed=0)
params = {
    k: jax.device_put(v, dev.jax_device).astype(
        jnp.bfloat16 if v.dtype == np.float32 and "positional" not in k else v.dtype
    )
    for k, v in raw.items()
}
model = SamModel(params, SamParams(), dev)

rng = np.random.default_rng(0)
imgs = [image_load_array(rng.integers(0, 256, (640, 640, 3)).astype(np.uint8)) for _ in range(8)]

with SamServer(model, batch_size=BS, max_delay_ms=5.0) as srv:
    # warm up the compiled pipeline (both full and ragged batch never occur:
    # the warmup fills one full group)
    futs = [srv.submit(imgs[i % 8], point=(320, 320)) for i in range(BS)]
    for f in futs:
        f.result()
    # same discipline as SamServer.warmup(): first-compile latencies and
    # the warmup batch must not poison the measured percentiles/occupancy
    srv.stats.reset()

    # host-side preprocessing runs on the server's prep pool, so even a
    # single-threaded client fills batches; 8 client threads here model
    # concurrent callers
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = list(pool.map(lambda i: srv.submit(imgs[i % 8], point=(100 + i, 200)), range(N)))
    masks = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    st = srv.stats

print(f"device: {dev.jax_device}", flush=True)
print(f"requests: {N}  wall: {dt*1000:.0f} ms  throughput: {N/dt:.1f} req/s", flush=True)
print(f"batches: {st.batches}  occupancy: {st.occupancy:.2f}", flush=True)
print(
    f"request latency p50: {st.p50_latency_ms:.1f} ms  p99: {st.p99_latency_ms:.1f} ms"
    " (submit -> result; on this env dominated by the tunnel RPC + transfer, not device time)",
    flush=True,
)
print(f"per-batch: {dt/max(st.batches - 0, 1)*1000:.1f} ms (incl ~27 ms tunnel RPC floor each)", flush=True)
assert all(m.extent == (640, 640) for m in masks)
print("OK", flush=True)
