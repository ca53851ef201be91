"""vision-bench harness surface (reference tests/benchmark.cpp analog):
output formats over a stubbed measurement (real rows are production-sized
and TPU-bound; the timing loop itself is exercised on-chip by bench.py),
plus the MFU scoreboard (VERDICT r4 next #3): every row carries analytic
GFLOP -> TF/s -> MFU against the chip's bf16 peak, with the GFLOP figure
traced from the exact step being timed (utils.flops.count_flops)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import vision_tpu.benchmark as vb
from vision_tpu.utils.flops import count_flops


def _row(name, gflop, mean, stdev, k, kind="TPU v5 lite"):
    tf, mfu = vb.workload_mfu(gflop, mean, kind)
    return {
        "name": name, "mean_ms": mean, "stdev_ms": stdev, "k": k,
        "gflop": gflop, "tf_per_sec": tf, "mfu": mfu,
    }


def test_benchmark_table_and_json_output(monkeypatch, capsys):
    rows = [
        _row("sam-encode-1024", 79.6, 3.456, 0.12, 8),
        _row("yolov9t-640", 11.2, 1.6, 0.05, 256),
    ]
    monkeypatch.setattr(vb, "run_benchmark", lambda names=None, k=8, repeats=3: rows)

    vb.main([])
    out = capsys.readouterr().out
    assert "| sam-encode-1024" in out and "3.5ms" in out and "256" in out
    assert "TF/s" in out and "MFU" in out
    assert "23.0" in out  # 79.6 GFLOP / 3.456 ms = 23.0 TF/s
    assert "11.7%" in out  # 23.0 / 197 peak

    vb.main(["--json"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["metric"] == "sam-encode-1024" and lines[0]["value"] == 3.456
    assert lines[0]["gflop"] == 79.6
    assert lines[0]["tf_per_sec"] == pytest.approx(23.03, abs=0.01)
    assert lines[0]["mfu"] == pytest.approx(0.1169, abs=0.001)
    assert lines[1]["metric"] == "yolov9t-640" and lines[1]["k"] == 256


def test_benchmark_rejects_unknown_model():
    with pytest.raises(SystemExit):
        vb.main(["no-such-model"])


def test_count_flops_primitives():
    """count_flops prices the traced matmul/conv arithmetic exactly:
    2*M*N*K for dot_general, 2*out*I*k*k for conv, scan multiplies its
    body by the trip count, and real arrays / ShapeDtypeStructs trace
    identically."""
    import jax

    a = jnp.zeros((7, 16), jnp.float32)
    b = jnp.zeros((16, 5), jnp.float32)
    assert count_flops(jnp.matmul, a, b) == 2 * 7 * 5 * 16

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jax.ShapeDtypeStruct((2, 8, 8, 3), jnp.float32)
    kern = jax.ShapeDtypeStruct((3, 3, 3, 4), jnp.float32)
    assert count_flops(conv, x, kern) == 2 * (2 * 8 * 8 * 4) * 3 * 3 * 3

    def scanned(a0):
        def body(c, _):
            return jnp.matmul(c, c), None
        out, _ = jax.lax.scan(body, a0, None, length=5)
        return out

    sq = jnp.zeros((4, 4), jnp.float32)
    assert count_flops(scanned, sq) == 5 * 2 * 4 * 4 * 4

    # elementwise-only graphs price to zero (MAC convention)
    assert count_flops(lambda t: jnp.tanh(t) + 1, sq) == 0


def test_workload_flops_pins():
    """Pin the traced workload FLOPs against the NOTES-derived anchors
    (regression check: a model change that alters the arithmetic shows up
    here deliberately, not as silent MFU drift).

    * SAM encode ~80 GFLOP/img (NOTES r4d XLA cost model + hand count).
    * ESRGAN @512^2 = 9.4 TFLOP exact conv count (NOTES r3: 37.6 TFLOP
      @1024^2, fully convolutional so 1/4 at 1/4 the pixels); the packed
      block-domain tail trades ~10% extra FLOPs for lane fill, so the
      traced figure sits just above the canonical count.
    """
    from vision_tpu.core.device import backend_init

    dev = backend_init("cpu")
    step, params, x = vb.BENCHMARKS["sam-encode-1024"](dev, jnp.float32)
    g_sam = count_flops(step, params, x) / 1e9
    assert g_sam == pytest.approx(80, rel=0.10)

    step, params, x = vb.BENCHMARKS["esrgan-512"](dev, jnp.float32)
    g_esr = count_flops(step, params, x) / 1e9
    assert 9410 * 0.98 < g_esr < 9410 * 1.15


def test_workload_mfu_unknown_device():
    """CPU / unknown chips report TF/s but no MFU; rows without a FLOP
    figure report neither."""
    tf, mfu = vb.workload_mfu(79.6, 4.0, "cpu")
    assert tf == pytest.approx(19.9) and mfu is None
    assert vb.workload_mfu(None, 4.0, "TPU v5 lite") == (None, None)
    assert vb.workload_mfu(79.6, 0.0, "TPU v5 lite") == (None, None)
