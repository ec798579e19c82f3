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


def test_summary_mode_emits_all_rows_from_cache(bench, monkeypatch, tmp_path,
                                                capsys):
    """With a zero budget the summary must still print one JSON line carrying
    the scan headline plus all five table rows from the cache, each marked
    from_cache (the outage-proof floor of the driver attestation)."""
    cache_file = tmp_path / "bench_cache.json"
    monkeypatch.setattr(bench, "_CACHE_FILE", str(cache_file))
    monkeypatch.setenv("BENCH_SUMMARY_BUDGET_S", "0")

    for name, argv in bench._SUMMARY_ROWS:
        key = bench._bench_cache_key(bench._build_parser().parse_args(argv))
        bench._emit_result({"metric": f"m_{name}", "value": 42.0,
                            "unit": "fps", "vs_baseline": 1.0}, key)
    capsys.readouterr()

    bench.run_summary()
    out = capsys.readouterr().out.strip()
    payload = json.loads(out)
    assert payload["metric"] == "m_scan" and payload["value"] == 42.0
    assert set(payload["summary"]) == {n for n, _ in bench._SUMMARY_ROWS}
    for name, row in payload["summary"].items():
        assert row["from_cache"] is True, name
        assert row["metric"] == f"m_{name}"


def test_summary_row_keys_are_distinct(bench):
    """Every summary row must key to its own cache slot — a collision would
    silently report one row's number under another's name."""
    keys = [bench._bench_cache_key(bench._build_parser().parse_args(argv))
            for _, argv in bench._SUMMARY_ROWS]
    assert len(set(keys)) == len(keys)


def test_summary_rows_cannot_recurse(bench, monkeypatch):
    """A flagless row would make its child a bare invocation, which routes to
    summary mode and forks recursively. Two guards: every row carries at
    least one explicit flag and never --summary; and run_summary refuses to
    start when the BENCH_IN_SUMMARY env marker set for children is present."""
    for name, argv in bench._SUMMARY_ROWS:
        assert argv, f"row {name} has no flags: its child would recurse"
        assert not bench._build_parser().parse_args(argv).summary, name
    monkeypatch.setenv("BENCH_IN_SUMMARY", "1")
    with pytest.raises(RuntimeError, match="re-entered"):
        bench.run_summary()


def test_stale_cache_emitted_when_tunnel_stays_down(bench, monkeypatch,
                                                    tmp_path, capsys):
    cache_file = tmp_path / "bench_cache.json"
    monkeypatch.setattr(bench, "_CACHE_FILE", str(cache_file))

    def fail(*a, **k):
        raise RuntimeError("the axon TPU tunnel is unreachable")

    monkeypatch.setattr(bench, "_check_backend_reachable", fail)
    monkeypatch.setattr(bench, "_bench_cache_key", lambda args: "default-mode")
    # an explicit flag: the truly bare invocation now routes to summary mode
    monkeypatch.setattr(sys, "argv", ["bench.py", "--scan", "64"])

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
