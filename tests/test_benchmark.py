"""vision-bench harness surface (reference tests/benchmark.cpp analog):
output formats over a stubbed measurement (real rows are production-sized
and TPU-bound; the timing loop itself is exercised on-chip by bench.py)."""

import json

import vision_tpu.benchmark as vb


def test_benchmark_table_and_json_output(monkeypatch, capsys):
    rows = [("sam-encode-1024", 3.456, 0.12, 8), ("yolov9t-640", 1.6, 0.05, 256)]
    monkeypatch.setattr(vb, "run_benchmark", lambda names=None, k=8, repeats=3: rows)

    vb.main([])
    out = capsys.readouterr().out
    assert "| sam-encode-1024" in out and "3.5ms" in out and "256" in out

    vb.main(["--json"])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {
        "metric": "sam-encode-1024", "value": 3.456, "unit": "ms/iter",
        "stdev": 0.12, "k": 8,
    }
    assert lines[1]["metric"] == "yolov9t-640" and lines[1]["k"] == 256


def test_benchmark_rejects_unknown_model():
    import pytest

    with pytest.raises(SystemExit):
        vb.main(["no-such-model"])
