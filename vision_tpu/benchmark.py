"""vision-bench — per-model benchmark harness.

Re-provision of the reference benchmark harness (tests/benchmark.cpp:
warm-up + timed loop with timeout/min/max iteration controls, mean±stdev,
markdown table output). Random production-shape weights are used (no
checkpoints in the environment; throughput is weight-independent).

Methodology (same as bench.py; see NOTES.md): the dev-tunnel RPC adds a
~27 ms fixed latency to every dispatch+readback, so per-call timing is
meaningless here. Every row therefore runs K iterations inside ONE jitted
fori_loop (serialized through a scalar dependency) and reports
(t_K - t_1) / (K - 1): steady-state device time per iteration, the number a
local host would see.

Usage: python -m vision_tpu.benchmark [model ...] [--k N] [--repeats N]
"""

from __future__ import annotations

import argparse
import statistics
import time
from functools import partial

import numpy as np

__all__ = ["run_benchmark", "main"]


def _loop_time(step, params, x, k: int = 8, repeats: int = 3):
    """Loop-differencing device time: run ``step`` k times inside one jitted
    program (iterations serialized through the accumulated scalar), subtract
    the single-iteration run, divide by k-1. Returns (mean_ms, stdev_ms, k)."""
    k = max(k, 2)  # differencing needs at least two iterations
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("kk",))
    def run_k(w, xx, kk):
        def body(i, acc):
            xi = xx + (acc * 0).astype(xx.dtype)
            return acc + step(w, xi)

        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))

    float(run_k(params, x, k))  # compile + warm
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
    mean = statistics.mean(diffs)
    stdev = statistics.stdev(diffs) if len(diffs) > 1 else 0.0
    return mean, stdev, k


def _bench_sam_encode(dev, dtype):
    import jax

    from .core.params import Params
    from .models.mobile_sam import sam_encode_image
    from .models.random_weights import random_mobile_sam_params
    from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

    raw = random_mobile_sam_params(0)
    params = {
        k: jax.device_put(v, dev.jax_device).astype(dtype if v.dtype == np.float32 else v.dtype)
        for k, v in raw.items()
    }

    def step(w, x):
        import jax.numpy as jnp

        img = normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dtype)
        return jnp.sum(sam_encode_image(Params(w), img, flash=True).astype(jnp.float32))

    x = _u8((1, 1024, 1024, 3))
    return step, params, x


def _u8(shape):
    import jax.numpy as jnp

    return jnp.asarray(np.random.default_rng(0).integers(0, 256, shape, dtype=np.uint8))


def _bench_esrgan(res):
    def build(dev, dtype):
        import jax
        import jax.numpy as jnp

        from .models.esrgan import EsrganParams, esrgan_generate_packed, esrgan_pack_weights
        from .models.random_weights import random_esrgan_params
        from .ops.preprocess import normalize_u8

        raw = random_esrgan_params(0)
        dev_params = {k: jax.device_put(v, dev.jax_device) for k, v in raw.items()}
        p = EsrganParams(4, 23)
        packed = esrgan_pack_weights(dev_params, p, dtype=dtype)
        gc, nf = packed.pop("gc"), packed.pop("nf")

        def step(w, x):
            img = normalize_u8(x, dtype=dtype)
            y = esrgan_generate_packed({**w, "gc": gc, "nf": nf}, img, p)
            return jnp.sum(y.astype(jnp.float32))

        return step, packed, _u8((1, res, res, 3))

    return build


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
    coords = jnp.asarray(np.array([[0.1, 0.2], [0.0, 0.0]], np.float32))

    def step(w, c):
        pp = Params(w)
        embed = jnp.zeros((1, 64, 64, 256), dtype)
        pred = sam_predict_mask(pp, embed, sam_encode_points(pp, c))
        return jnp.sum(pred.masks) + jnp.sum(pred.iou)

    return step, params, coords


def _bench_generic(make_params, forward, input_shape, u8=True, keep_f32=()):
    def build(dev, dtype):
        import jax
        import jax.numpy as jnp

        raw = make_params()
        params = {}
        for k, v in raw.items():
            a = jax.device_put(v, dev.jax_device)
            if v.dtype == np.float32 and not any(s in k for s in keep_f32):
                a = a.astype(dtype)
            params[k] = a

        def step(w, x):
            return jnp.sum(forward(w, x, dtype).astype(jnp.float32))

        if u8:
            x = _u8(input_shape)
        else:
            x = jnp.asarray(np.random.default_rng(0).standard_normal(input_shape), dtype)
        return step, params, x

    return build


def _make_depthany(variant):
    def build(dev, dtype):
        from functools import partial

        from .core.params import Params
        from .models.depth_anything import DepthAnythingParams, depthany_predict
        from .models.dino import DinoParams
        from .models.random_weights import random_depth_anything_params
        from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

        dim, heads = (384, 6) if variant == "small" else (768, 12)
        p = DepthAnythingParams(dino=DinoParams(14, dim, heads, 12), feature_layers=(2, 5, 8, 11))

        def forward(w, x, dt):
            return depthany_predict(Params(w), normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dt), p, flash=True)

        return _bench_generic(
            partial(random_depth_anything_params, variant), forward, (1, 518, 714, 3),
            keep_f32=("position_embeddings", "cls_token"),
        )(dev, dtype)

    return build


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


def _make_sam3_vision(dev, dtype):
    import jax
    import jax.numpy as jnp

    from .core.params import Params
    from .models.random_weights import random_sam3_vision_params
    from .models.sam3 import Sam3VitParams, encode_vision, sam3_pack_vision_weights

    p = Sam3VitParams()
    raw = random_sam3_vision_params()
    params = {}
    for k, v in raw.items():
        a = jax.device_put(v, dev.jax_device)
        if v.dtype == np.float32 and "position_embeddings" not in k:
            a = a.astype(dtype)
        params[k] = a
    # production path: fused window-major scan trunk over stacked weights
    stack = sam3_pack_vision_weights(params, p)

    def step(w, x):
        # [-1, 1] input mapping (sam3_process_input, reference sam3.h:619-622)
        img = x.astype(dtype) / 127.5 - 1.0
        out = encode_vision(Params(w["p"]), img, p, flash=True, win_stack=w["s"])
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out.fpn_hidden_states)

    return step, {"p": params, "s": stack}, _u8((1, 1008, 1008, 3))


def _make_birefnet(variant):
    def build(dev, dtype):
        from .core.device import BackendType
        from .core.params import Params
        from .models.birefnet import BirefnetParams, birefnet_predict
        from .models.random_weights import random_birefnet_params
        from .models.swin import SWIN_L_PARAMS, SWIN_T_PARAMS
        from .ops.preprocess import IMAGENET_MEAN, IMAGENET_STD, normalize_u8

        enc = SWIN_T_PARAMS if variant == "tiny" else SWIN_L_PARAMS
        p = BirefnetParams(image_size=1024, image_extent=(1024, 1024), encoder=enc)
        bound = 2 if dev.type & BackendType.tpu else None

        def forward(w, x, dt):
            return birefnet_predict(
                Params(w), normalize_u8(x, IMAGENET_MEAN, IMAGENET_STD, dt), p,
                flash=True, deform_bound=bound,
            )

        return _bench_generic(
            lambda: random_birefnet_params(variant), forward, (1, 1024, 1024, 3)
        )(dev, dtype)

    return build


BENCHMARKS = {
    "sam-encode-1024": _bench_sam_encode,
    "sam-decode": _bench_sam_decode,
    "esrgan-512": _bench_esrgan(512),
    "esrgan-1024": _bench_esrgan(1024),
    "depthany-small": _make_depthany("small"),
    "depthany-base": _make_depthany("base"),
    "migan-512": _make_migan,
    "yolov9t-640": _make_yolo,
    "birefnet-1024": _make_birefnet("tiny"),
    "birefnet-full-1024": _make_birefnet("large"),
    "sam3-vision-1008": _make_sam3_vision,
}

# bf16 MXU peak by jax device_kind; MFU is only reported when the kind is
# known (public figures; this box's chip enumerates as "TPU v5 lite" = v5e)
PEAK_TF_PER_SEC = {
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def workload_mfu(gflop: float | None, mean_ms: float, device_kind: str):
    """(tf_per_sec, mfu) for a finished row; Nones where unknown.

    TF/s falls out as GFLOP/ms; MFU is against the chip's bf16 MXU peak —
    the reference's bench table (tests/benchmark.cpp:328-339) reports only
    wall time, this adds the hardware-efficiency axis NOTES tracked by
    hand (VERDICT r4 next #3). ``gflop`` comes from
    ``utils.flops.count_flops`` over the exact step being timed — the
    EXECUTED matmul/conv arithmetic, which for reformulated paths (the
    ESRGAN block-domain tail trades ~10% extra FLOPs for 4x lane fill)
    runs slightly above the canonical model count.
    """
    if not gflop or mean_ms <= 0:
        return None, None
    tf = gflop / mean_ms
    peak = PEAK_TF_PER_SEC.get(device_kind)
    return tf, (tf / peak if peak else None)


def run_benchmark(names=None, k=8, repeats=3):
    from .core.device import backend_init

    dev = backend_init()
    dtype = dev.preferred_float_type
    names = names or list(BENCHMARKS.keys())
    rows = []
    import sys

    kind = str(getattr(dev.jax_device, "device_kind", ""))
    from .utils.flops import count_flops

    for name in names:
        t0 = time.perf_counter()
        step, params, x = BENCHMARKS[name](dev, dtype)
        # trace-only FLOP count of the exact step being timed (no compile)
        gflop = count_flops(step, params, x) / 1e9
        mean, stdev, n = _loop_time(step, params, x, k=k, repeats=repeats)
        if mean < 1.0 and k < 256:
            # sub-ms workloads drown in timing noise at small K
            mean, stdev, n = _loop_time(step, params, x, k=256, repeats=repeats)
        tf, mfu = workload_mfu(gflop, mean, kind)
        rows.append({
            "name": name, "mean_ms": mean, "stdev_ms": stdev, "k": n,
            "gflop": gflop, "tf_per_sec": tf, "mfu": mfu,
        })
        # progress on stderr: a full table is many minutes of remote compiles
        # and the table itself prints only at the end
        eff = f", {tf:.1f} TF/s" if tf else ""
        print(
            f"# {name}: {mean:.1f} ms/iter (k={n}{eff}) "
            f"[{time.perf_counter() - t0:.0f}s incl. compile]",
            file=sys.stderr, flush=True,
        )
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(prog="vision-bench")
    p.add_argument("models", nargs="*", choices=list(BENCHMARKS.keys()) + [[]], default=[])
    p.add_argument("--k", type=int, default=8, help="iterations inside the timing loop")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--json", action="store_true",
        help="one JSON line per row (machine-readable; bench.py's format)",
    )
    args = p.parse_args(argv)
    rows = run_benchmark(args.models or None, k=args.k, repeats=args.repeats)
    if args.json:
        import json

        for r in rows:
            rec = {
                "metric": r["name"], "value": round(r["mean_ms"], 3),
                "unit": "ms/iter", "stdev": round(r["stdev_ms"], 3), "k": r["k"],
            }
            if r["gflop"] is not None:
                rec["gflop"] = round(r["gflop"], 1)
                rec["tf_per_sec"] = round(r["tf_per_sec"], 2)
            if r["mfu"] is not None:
                rec["mfu"] = round(r["mfu"], 4)
            print(json.dumps(rec))
        return
    print("device ms/iter, loop-differenced (RPC floor excluded; see NOTES.md)")
    print(f"| {'benchmark':<20} | {'mean':>10} | {'stdev':>8} | {'K':>3} | {'TF/s':>7} | {'MFU':>5} |")
    print(f"|{'-' * 22}|{'-' * 12}|{'-' * 10}|{'-' * 5}|{'-' * 9}|{'-' * 7}|")
    for r in rows:
        tf = f"{r['tf_per_sec']:7.1f}" if r["tf_per_sec"] else f"{'—':>7}"
        mfu = f"{r['mfu'] * 100:4.1f}%" if r["mfu"] else f"{'—':>5}"
        print(
            f"| {r['name']:<20} | {r['mean_ms']:8.1f}ms | {r['stdev_ms']:6.1f}ms "
            f"| {r['k']:>3} | {tf} | {mfu} |"
        )


if __name__ == "__main__":
    main()
