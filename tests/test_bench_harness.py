"""bench.py harness logic — the driver-critical TPU probe/retry and the
jitter-robust timing estimators, tested without a tunnel (subprocess and
sleep monkeypatched). The on-chip path is exercised by the driver's own
bench run; these pin the failure-mode behavior VERDICT r3 missing #1 asked
for (a transient outage must retry bounded, a CPU fallback or compute hang
must never green-light the bench)."""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, ".")  # repo root (bench.py lives next to the package)
import bench


class _FakeRun:
    """subprocess.run stand-in yielding a scripted sequence of outcomes:
    int = returncode, 'timeout' = TimeoutExpired."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = 0

    def __call__(self, *a, **kw):
        self.calls += 1
        out = self.outcomes.pop(0)
        if out == "timeout":
            raise subprocess.TimeoutExpired(cmd="probe", timeout=kw.get("timeout"))
        return types.SimpleNamespace(returncode=out)


def _patch(monkeypatch, outcomes):
    fake = _FakeRun(outcomes)
    sleeps = []
    monkeypatch.setattr(subprocess, "run", fake)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    return fake, sleeps


def test_probe_success_first_try(monkeypatch):
    fake, sleeps = _patch(monkeypatch, [0])
    assert bench._wait_for_tpu(attempts=4) is True
    assert fake.calls == 1 and sleeps == []


def test_probe_retries_then_succeeds(monkeypatch, capsys):
    fake, sleeps = _patch(monkeypatch, [3, "timeout", 0])
    assert bench._wait_for_tpu(attempts=4, backoff=7) is True
    assert fake.calls == 3 and sleeps == [7, 7]
    err = capsys.readouterr().err
    # the two failure modes are named distinctly in the narration
    assert "no TPU device (CPU fallback)" in err
    assert "probe hung" in err


def test_probe_bounded_give_up(monkeypatch):
    fake, sleeps = _patch(monkeypatch, ["timeout"] * 3)
    assert bench._wait_for_tpu(attempts=3, backoff=1) is False
    assert fake.calls == 3
    assert sleeps == [1, 1]  # no sleep after the final attempt


def test_probe_command_requires_compute(monkeypatch):
    """The probe subprocess must do a real dispatch+readback, not just
    enumerate (round-4e: a degraded phase enumerated in 260 s with all
    compute hung)."""
    captured = {}

    def grab(cmd, **kw):
        captured["code"] = cmd[2]
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(subprocess, "run", grab)
    bench._wait_for_tpu(attempts=1)
    code = captured["code"]
    assert "jax.devices()" in code
    assert "x @ x" in code  # compute...
    assert "float(" in code and "sum" in code  # ...with a scalar readback


def test_loop_method_median_rejects_one_stall():
    """One multi-second stall inside a single t_K - t_1 difference must not
    skew the reported value (the 03:04 encode-180 reading)."""
    calls = {"n": 0}

    def fake_timer(params, x, k):
        calls["n"] += 1
        if calls["n"] == 4:  # one stalled readback somewhere in the middle
            fake_timer.stall = 10.0
        return 0.0

    fake_timer.stall = 0.0

    import time as _time

    real = _time.perf_counter
    t = [0.0]

    def clock():
        return t[0]

    def run(params, x, k):
        t[0] += 0.001 * k + fake_timer(params, x, k) + fake_timer.stall
        fake_timer.stall = 0.0
        return 0.0

    class _F:
        def __call__(self, params, x, k):
            run(params, x, k)
            return 0.0

    import bench as b

    orig = b.time.perf_counter
    b.time.perf_counter = clock
    try:
        per = b._loop_method_median(_F(), None, None, 5, estimates=5, repeats=1)
    finally:
        b.time.perf_counter = orig
    assert per == pytest.approx(0.001, rel=0.01)
