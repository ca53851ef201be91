"""vision-bench harness surface (reference tests/benchmark.cpp analog):
output formats over a stubbed measurement (real rows are production-sized
and TPU-bound; the timing loop itself is exercised on-chip by bench.py),
plus the MFU scoreboard (VERDICT r4 next #3): every row carries analytic
GFLOP -> TF/s -> MFU against the chip's bf16 peak."""

import json

import pytest

import vision_tpu.benchmark as vb


def _row(name, mean, stdev, k, kind="TPU v5 lite"):
    gflop, tf, mfu = vb.workload_mfu(name, mean, kind)
    return {
        "name": name, "mean_ms": mean, "stdev_ms": stdev, "k": k,
        "gflop": gflop, "tf_per_sec": tf, "mfu": mfu,
    }


def test_benchmark_table_and_json_output(monkeypatch, capsys):
    rows = [_row("sam-encode-1024", 3.456, 0.12, 8), _row("yolov9t-640", 1.6, 0.05, 256)]
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


def test_workload_gflop_covers_every_row():
    """Every benchmark row must carry an analytic FLOP figure — a new row
    without one silently loses its MFU column."""
    assert set(vb.WORKLOAD_GFLOP) == set(vb.BENCHMARKS)
    assert all(g > 0 for g in vb.WORKLOAD_GFLOP.values())


def test_workload_gflop_pins():
    """Pin the NOTES-derived anchors (regression check: a model change that
    alters the workload FLOPs must update the table deliberately).

    * ESRGAN @1024^2 = 37.6 TFLOP exact conv count (NOTES r3); the 512 row
      is the same fully-convolutional net at 1/4 the pixels.
    * SAM encode ~80 GFLOP/img, flat across batch (NOTES r4d XLA cost model).
    * SAM3 vision ~6.4 TFLOP (28 window + 4 global layers @ ~1.8e11 each +
      embed/neck, NOTES r4 floor math).
    """
    g = vb.WORKLOAD_GFLOP
    assert g["esrgan-1024"] == pytest.approx(37600, rel=0.02)
    assert g["esrgan-1024"] / g["esrgan-512"] == pytest.approx(4.0, rel=0.02)
    assert g["sam-encode-1024"] == pytest.approx(80, rel=0.08)
    assert g["sam3-vision-1008"] == pytest.approx(6400, rel=0.08)


def test_workload_mfu_unknown_device():
    """CPU / unknown chips report TF/s but no MFU; unknown rows report
    neither."""
    gflop, tf, mfu = vb.workload_mfu("sam-encode-1024", 4.0, "cpu")
    assert gflop == pytest.approx(79.6) and tf == pytest.approx(19.9) and mfu is None
    assert vb.workload_mfu("not-a-row", 4.0, "TPU v5 lite") == (None, None, None)
