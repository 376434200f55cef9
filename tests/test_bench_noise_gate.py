"""bench.py noise gate (round 8, round-7 judge task 1): the pre-flight
probe burst must hold the capture until the host reads quiet (or the
wait budget runs out), never pollute the run's own probe series, and
the stamp must come from the run's probes. Pure-python — no Spark."""

import importlib.util
import sys
from pathlib import Path


def _load_bench(monkeypatch, wait_sec="5"):
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_SEC", wait_sec)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        str(Path(__file__).resolve().parent.parent / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_quiet_host_passes_first_attempt(monkeypatch):
    b = _load_bench(monkeypatch)
    # uniform probes = a quiet host
    times = iter([0.02] * 100)

    def fake_calibrate(tag=""):
        t = next(times)
        b._CALIB_TIMES.append(t)
        b._CALIB_TAGS.append(tag)
        return t

    monkeypatch.setattr(b, "calibrate", fake_calibrate)
    r = b.wait_for_quiet_window()
    assert r["preflight_quiet"] is True
    assert r["preflight_attempts"] == 1
    assert r["preflight_trimmed"] <= b.QUIET_TRIMMED_BAR
    # the burst never pollutes the run's shared series
    assert b._CALIB_TIMES == [] and b._CALIB_TAGS == []


def test_loaded_host_retries_then_passes(monkeypatch):
    b = _load_bench(monkeypatch, wait_sec="60")
    monkeypatch.setattr(b, "QUIET_RETRY_SLEEP", 0.0)
    # burst 1: >10% of probes slow (trimmed = p90/med fires);
    # burst 2: quiet
    burst1 = [0.02] * 9 + [0.06] * 3
    burst2 = [0.02] * 12
    times = iter(burst1 + burst2)

    def fake_calibrate(tag=""):
        t = next(times)
        b._CALIB_TIMES.append(t)
        b._CALIB_TAGS.append(tag)
        return t

    monkeypatch.setattr(b, "calibrate", fake_calibrate)
    r = b.wait_for_quiet_window()
    assert r["preflight_quiet"] is True
    assert r["preflight_attempts"] == 2
    assert b._CALIB_TIMES == []


def test_wait_budget_exhausted_proceeds_loaded(monkeypatch):
    b = _load_bench(monkeypatch, wait_sec="0")  # budget already spent
    monkeypatch.setattr(b, "QUIET_RETRY_SLEEP", 0.0)
    times = iter(([0.02] * 9 + [0.06] * 3) * 10)

    def fake_calibrate(tag=""):
        t = next(times)
        b._CALIB_TIMES.append(t)
        b._CALIB_TAGS.append(tag)
        return t

    monkeypatch.setattr(b, "calibrate", fake_calibrate)
    r = b.wait_for_quiet_window()
    # proceeds rather than stalling forever, and says so honestly
    assert r["preflight_quiet"] is False
    assert r["preflight_trimmed"] > b.QUIET_TRIMMED_BAR
