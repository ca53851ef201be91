"""vision-bench — per-model benchmark harness.

Re-provision of the reference benchmark harness (tests/benchmark.cpp:
warm-up + timed loop with timeout/min/max iteration controls, mean±stdev,
markdown table output). Random production-shape weights are used (no
checkpoints in the environment; throughput is weight-independent).

Usage: python -m vision_tpu.benchmark [model ...] [--iters N] [--timeout S]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np

__all__ = ["run_benchmark", "main"]


def _timed_loop(fn, warmup: int, min_iters: int, max_iters: int, timeout_s: float):
    for _ in range(warmup):
        fn()
    times = []
    deadline = time.time() + timeout_s
    while len(times) < max_iters and (len(times) < min_iters or time.time() < deadline):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1000.0)
        if time.time() > deadline and len(times) >= min_iters:
            break
    mean = statistics.mean(times)
    stdev = statistics.stdev(times) if len(times) > 1 else 0.0
    return mean, stdev, len(times)


def _bench_sam_encode(dev, dtype):
    import jax
    import jax.numpy as jnp

    from .core.params import Params
    from .models.mobile_sam import sam_encode_image
    from .models.random_weights import random_mobile_sam_params
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    raw = random_mobile_sam_params(0)
    params = {
        k: jax.device_put(v, dev.jax_device).astype(dtype if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }

    @jax.jit
    def run(w, x):
        img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return jnp.sum(sam_encode_image(Params(w), img).astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 1024, 1024, 3), dtype=np.uint8))
    return lambda: float(run(params, x))


def _bench_esrgan(dev, dtype):
    import jax
    import jax.numpy as jnp

    from .core.params import Params
    from .models.esrgan import EsrganParams, esrgan_generate
    from .models.random_weights import random_esrgan_params
    from .ops.preprocess import normalize_u8

    raw = random_esrgan_params(0)
    params = {k: jax.device_put(v, dev.jax_device).astype(dtype) for k, v in raw.items()}
    p = EsrganParams(4, 23)

    @jax.jit
    def run(w, x):
        img = normalize_u8(x, dtype=dtype)
        return jnp.sum(esrgan_generate(Params(w), img, p).astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 512, 512, 3), dtype=np.uint8))
    return lambda: float(run(params, x))


def _bench_sam_decode(dev, dtype):
    import jax
    import jax.numpy as jnp

    from .core.params import Params
    from .models.mobile_sam import sam_encode_points, sam_predict_mask
    from .models.random_weights import random_mobile_sam_params

    raw = random_mobile_sam_params(0)
    params = {
        k: jax.device_put(v, dev.jax_device).astype(dtype if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }
    embed = jnp.zeros((1, 64, 64, 256), dtype)
    coords = jnp.asarray(np.array([[0.1, 0.2], [0.0, 0.0]], np.float32))

    @jax.jit
    def run(w, e, c):
        pp = Params(w)
        pred = sam_predict_mask(pp, e, sam_encode_points(pp, c))
        return jnp.sum(pred.masks) + jnp.sum(pred.iou)

    return lambda: float(run(params, embed, coords))



def _bench_generic(make_params, forward, input_shape, u8=True, keep_f32=()):
    import jax
    import jax.numpy as jnp

    def build(dev, dtype):
        raw = make_params()
        params = {}
        for k, v in raw.items():
            a = jax.device_put(v, dev.jax_device)
            if v.dtype == np.float32 and not any(s in k for s in keep_f32):
                a = a.astype(dtype)
            params[k] = a

        @jax.jit
        def run(w, x):
            return jnp.sum(forward(w, x, dtype).astype(jnp.float32))

        if u8:
            x = jnp.asarray(np.random.default_rng(0).integers(0, 256, input_shape, dtype=np.uint8))
        else:
            x = jnp.asarray(np.random.default_rng(0).standard_normal(input_shape), dtype)
        return lambda: float(run(params, x))

    return build


def _make_depthany(dev, dtype):
    from .core.params import Params
    from .models.depth_anything import DepthAnythingParams, depthany_predict
    from .models.dino import DinoParams
    from .models.random_weights import random_depth_anything_params
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    p = DepthAnythingParams(dino=DinoParams(14, 384, 6, 12), feature_layers=(2, 5, 8, 11))

    def forward(w, x, dt):
        return depthany_predict(Params(w), normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dt), p, flash=True)

    return _bench_generic(
        random_depth_anything_params, forward, (1, 518, 714, 3),
        keep_f32=("position_embeddings", "cls_token"),
    )(dev, dtype)


def _make_migan(dev, dtype):
    from .core.params import Params
    from .models.migan import MiganParams, migan_generate
    from .models.random_weights import random_migan_params

    p = MiganParams(resolution=512)

    def forward(w, x, dt):
        return migan_generate(Params(w), x.astype(dt), p)

    return _bench_generic(lambda: random_migan_params(512), forward, (1, 512, 512, 4), u8=False)(dev, dtype)


def _make_yolo(dev, dtype):
    from .core.params import Params
    from .models.random_weights import random_yolov9t_params
    from .models.yolov9t import Yolov9tParams, yolov9t_forward
    from .ops.preprocess import normalize_u8

    p = Yolov9tParams()

    def forward(w, x, dt):
        out = yolov9t_forward(Params(w), normalize_u8(x, dtype=dt), p)
        return out.boxes.sum() + out.scores.sum()

    return _bench_generic(random_yolov9t_params, forward, (1, 640, 640, 3))(dev, dtype)


def _make_birefnet(dev, dtype):
    from .core.params import Params
    from .models.birefnet import BirefnetParams, birefnet_predict
    from .models.random_weights import random_birefnet_params
    from .models.swin import SWIN_T_PARAMS
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    p = BirefnetParams(image_size=1024, image_extent=(1024, 1024), encoder=SWIN_T_PARAMS)

    def forward(w, x, dt):
        return birefnet_predict(Params(w), normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dt), p)

    return _bench_generic(random_birefnet_params, forward, (1, 1024, 1024, 3))(dev, dtype)


BENCHMARKS = {
    "sam-encode-1024": _bench_sam_encode,
    "sam-decode": _bench_sam_decode,
    "esrgan-512": _bench_esrgan,
    "depthany-small": _make_depthany,
    "migan-512": _make_migan,
    "yolov9t-640": _make_yolo,
    "birefnet-1024": _make_birefnet,
}


def run_benchmark(names=None, warmup=2, min_iters=5, max_iters=30, timeout_s=20.0):
    from .core.device import backend_init

    dev = backend_init()
    dtype = dev.preferred_float_type
    names = names or list(BENCHMARKS.keys())
    rows = []
    for name in names:
        make = BENCHMARKS[name]
        fn = make(dev, dtype)
        mean, stdev, n = _timed_loop(fn, warmup, min_iters, max_iters, timeout_s)
        rows.append((name, mean, stdev, n))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(prog="vision-bench")
    p.add_argument("models", nargs="*", choices=list(BENCHMARKS.keys()) + [[]], default=[])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--timeout", type=float, default=20.0)
    args = p.parse_args(argv)
    rows = run_benchmark(args.models or None, max_iters=args.iters, timeout_s=args.timeout)
    print(f"| {'benchmark':<20} | {'mean':>10} | {'stdev':>8} | {'iters':>5} |")
    print(f"|{'-' * 22}|{'-' * 12}|{'-' * 10}|{'-' * 7}|")
    for name, mean, stdev, n in rows:
        print(f"| {name:<20} | {mean:8.1f}ms | {stdev:6.1f}ms | {n:>5} |")


if __name__ == "__main__":
    main()
