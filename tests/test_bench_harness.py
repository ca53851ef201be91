"""bench.py harness logic — the driver-critical TPU probe/retry and the
jitter-robust timing estimators, tested without a tunnel (subprocess and
sleep monkeypatched). The on-chip path is exercised by the driver's own
bench run; these pin the failure-mode behavior VERDICT r3 missing #1 asked
for (a transient outage must retry bounded, a CPU fallback or compute hang
must never green-light the bench)."""

import json
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


_BENCH = str(__import__("pathlib").Path(bench.__file__).resolve())


def _run_bench(fake, timeout_s="10", wait_for=None, send_sigterm=False):
    # NOTE: the per-metric deadline must comfortably exceed child startup
    # (~2s of interpreter + sitecustomize + numpy on this box) or 'ok'
    # children get killed before they print
    """Run bench.py as the driver does, with scripted metric outcomes
    (VISP_BENCH_FAKE) and a short per-metric deadline. Returns
    (rc, stdout_lines)."""
    import os
    import signal as _signal
    import time as _time

    env = dict(
        os.environ,
        VISP_BENCH_FAKE=fake,
        VISP_BENCH_METRIC_TIMEOUT=timeout_s,
    )
    proc = subprocess.Popen(
        [sys.executable, _BENCH],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )
    if send_sigterm:
        # wait until the headline line is out, then deliver the driver's
        # kill. Generous timeout: under full-suite load on this 1-core box
        # the handler's child-terminate + flush has been observed to need
        # well over 30 s (suite r5c flake) — the assertion is THAT the
        # flush happens, not that a starved box does it quickly.
        first = proc.stdout.readline()
        assert first.startswith("{"), first
        proc.send_signal(_signal.SIGTERM)
        out_rest, _ = proc.communicate(timeout=120)
        out = first + out_rest
    else:
        out, _ = proc.communicate(timeout=60)
    lines = [ln for ln in out.splitlines() if ln.strip()]
    return proc.returncode, lines


def test_bench_partial_output_on_hang():
    """A metric that hangs past its deadline must not lose the completed
    ones: the headline (encode, run FIRST) is printed the moment it lands,
    the hung metric is killed, later metrics still run, and the final line
    re-prints the headline for the driver's last-line parse (VERDICT r4 #1)."""
    rc, lines = _run_bench("encode:ok,mask:hang,esrgan:ok")
    assert rc == 0
    parsed = [json.loads(ln) for ln in lines if ln.startswith("{")]
    metrics = [p["metric"] for p in parsed]
    assert metrics[0] == "fake_encode"  # headline first, emitted immediately
    assert "fake_esrgan" in metrics  # the hang did not eat the rest
    assert "fake_mask" not in metrics  # the hung metric was killed
    assert json.loads(lines[-1])["metric"] == "fake_encode"  # final re-print


def test_bench_sigterm_flushes_headline():
    """`timeout`'s SIGTERM (rc=124 in BENCH_r03/r04) must leave the
    completed headline as the last stdout line instead of dying unprinted."""
    rc, lines = _run_bench("encode:ok,mask:hang", timeout_s="600", send_sigterm=True)
    assert rc == 0
    assert json.loads(lines[-1])["metric"] == "fake_encode"


def test_bench_all_fail_exits_nonzero():
    rc, lines = _run_bench("encode:fail,mask:fail,esrgan:fail")
    assert rc == 1
    assert not [ln for ln in lines if ln.startswith("{")]


def test_probe_budget_cap(monkeypatch, capsys):
    """The probe ladder gives up when the wall budget is exhausted instead
    of riding out every backoff (r4: the ladder alone could eat ~44 min)."""
    fake, sleeps = _patch(monkeypatch, ["timeout"] * 10)
    t = [0.0]
    monkeypatch.setattr(bench.time, "monotonic", lambda: t[0])

    def advancing_sleep(s):
        sleeps.append(s)
        t[0] += s

    monkeypatch.setattr(bench.time, "sleep", advancing_sleep)
    assert bench._wait_for_tpu(attempts=10, backoff=100, budget=250) is False
    assert len(sleeps) == 2  # third backoff would cross the 250s budget
    assert "budget" in capsys.readouterr().err


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
