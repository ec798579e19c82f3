"""bench.py outage behavior: the tunnel probe retries across a window instead
of failing once (the single 600 s probe produced an empty BENCH_r03 during a
transient outage), and a tunnel that stays down emits the last good cached
result marked ``stale: true`` instead of recording nothing."""
import importlib.util
import json
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", str(Path(__file__).resolve().parents[1] / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_retries_until_tunnel_recovers(bench, monkeypatch):
    calls = []

    def fake_run(cmd, timeout=None, check=None, capture_output=None):
        calls.append(timeout)
        if len(calls) < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return None

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._check_backend_reachable(window_s=10_000)
    assert len(calls) == 3
    # escalating per-attempt timeouts
    assert calls[0] < calls[1] < calls[2]


def test_probe_raises_after_window_exhausted(bench, monkeypatch):
    def fake_run(cmd, timeout=None, check=None, capture_output=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    clock = iter(range(0, 100_000, 200))
    monkeypatch.setattr(bench.time, "monotonic", lambda: float(next(clock)))
    with pytest.raises(RuntimeError, match="tunnel is unreachable"):
        bench._check_backend_reachable(window_s=600)


def test_stale_cache_emitted_when_tunnel_stays_down(bench, monkeypatch,
                                                    tmp_path, capsys):
    cache_file = tmp_path / "bench_cache.json"
    monkeypatch.setattr(bench, "_CACHE_FILE", str(cache_file))

    def fail(*a, **k):
        raise RuntimeError("the axon TPU tunnel is unreachable")

    monkeypatch.setattr(bench, "_check_backend_reachable", fail)
    monkeypatch.setattr(bench, "_bench_cache_key", lambda args: "default-mode")
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    # no cache yet: the outage propagates (rc=1, diagnosable)
    with pytest.raises(RuntimeError):
        bench.main()

    # seed the cache the way a successful run would
    bench._emit_result({"metric": "siammask_sharp_scan_fps_T64",
                        "value": 2123.0, "unit": "fps",
                        "vs_baseline": 37.9}, "default-mode")
    capsys.readouterr()

    bench.main()
    out = capsys.readouterr().out.strip()
    payload = json.loads(out)
    assert payload["stale"] is True
    assert payload["value"] == 2123.0
    assert "unreachable" in payload["stale_reason"]
    assert payload["cached_at"]
