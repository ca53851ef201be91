"""One-time measurement: XLA cost-analysis FLOPs for every benchmark row.

Compiles each vision_tpu.benchmark step (the exact workload the bench
times) on the CPU backend and reads compiled.cost_analysis()["flops"].
The resulting GFLOP figures are pinned as WORKLOAD_GFLOP in
vision_tpu/benchmark.py (VERDICT r4 next #3: MFU on the scoreboard) and
cross-checked against NOTES' hand derivations (ESRGAN exact conv count
37.6 TFLOP @1024^2 4x, SAM encode ~80 GFLOP, SAM3 per-layer floor math).

Usage: python scripts/exp_flops.py [row ...]   (default: all rows)
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from vision_tpu.benchmark import BENCHMARKS  # noqa: E402
from vision_tpu.core.device import BackendType, backend_init  # noqa: E402


def main():
    dev = backend_init(BackendType.cpu)
    names = sys.argv[1:] or list(BENCHMARKS.keys())
    for name in names:
        try:
            step, params, x = BENCHMARKS[name](dev, dev.preferred_float_type)
            compiled = jax.jit(step).lower(params, x).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
            print(f"{name}: {flops / 1e9:.2f} GFLOP", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
