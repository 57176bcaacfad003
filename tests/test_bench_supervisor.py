"""bench.py tunnel-resilience supervisor (the round-3 lesson: BENCH_r03 was
rc=1/parsed-null because bench.py crashed on first backend touch while the
axon tunnel was dark).  These tests exercise the supervisor's state machine
hermetically - probe/run subprocesses are monkeypatched, no TPU needed."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
import bench


def _completed(rc=0, stdout="", stderr=""):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout, stderr=stderr)


GOOD_LINE = json.dumps({"metric": "UASTC->BC7 aggregate transcode throughput", "value": 1.0,
                        "unit": "Mtexels/s", "vs_baseline": 1.0}) + "\n"


def _last_json(out: str) -> dict:
    return json.loads(out.strip().splitlines()[-1])


def test_probe_never_succeeds_emits_error_json(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_TUNNEL_BUDGET_S", "0.01")
    monkeypatch.setattr(bench, "_probe_device", lambda t: False)
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 1
    assert rec["value"] is None and "error" in rec
    assert "TPU unavailable" in rec["error"]


def test_probe_ok_child_ok_relays_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_device", lambda t: True)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _completed(0, GOOD_LINE, "logs\n"))
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 0
    assert rec["value"] == 1.0 and "error" not in rec


def test_child_timeout_exhausts_budget_then_error_json(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_TUNNEL_BUDGET_S", "0.01")
    monkeypatch.setattr(bench, "_probe_device", lambda t: True)

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1, stderr=b"partial")

    monkeypatch.setattr(subprocess, "run", boom)
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 1
    assert "timed out" in rec["error"]


def test_child_fails_once_then_succeeds(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_TUNNEL_BUDGET_S", "3600")
    monkeypatch.setattr(bench, "_probe_device", lambda t: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = []

    def run(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            return _completed(1, "", "RuntimeError: Unable to initialize backend 'axon'\n")
        return _completed(0, GOOD_LINE, "")

    monkeypatch.setattr(subprocess, "run", run)
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 0 and len(calls) == 2
    assert rec["value"] == 1.0


def test_error_json_carries_probe_timeline(monkeypatch, capsys):
    """Round-4 verdict item 5: a failed capture must be diagnosable post-hoc
    - the error JSON carries attempt count, budget, and a per-event
    timeline with monotonic offsets."""
    monkeypatch.setenv("BENCH_TUNNEL_BUDGET_S", "0.01")
    probes = []
    monkeypatch.setattr(bench, "_probe_device", lambda t: probes.append(1) or False)
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 1
    assert rec["probe_attempts"] == len(probes) >= 1
    assert rec["budget_s"] == 0.01
    assert len(rec["timeline"]) == len(probes)
    for ev in rec["timeline"]:
        assert isinstance(ev["t_s"], float) and ev["t_s"] >= 0
        assert "probe" in ev["event"] and "failed" in ev["event"]


def test_timeline_mixes_probe_and_run_events(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_TUNNEL_BUDGET_S", "0.01")
    monkeypatch.setattr(bench, "_probe_device", lambda t: True)

    def boom(*a, **k):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(subprocess, "run", boom)
    rc = bench.supervise()
    rec = _last_json(capsys.readouterr().out)
    assert rc == 1
    events = [ev["event"] for ev in rec["timeline"]]
    assert "probe 1 ok" in events and "run timeout" in events


def test_default_budget_covers_observed_outages(monkeypatch):
    """The default budget must exceed the worst dark stretch documented in
    CLAUDE.md (60+ min) so a capture started at the front of an outage
    still reaches the far side (round-4 verdict item 6a)."""
    monkeypatch.delenv("BENCH_TUNNEL_BUDGET_S", raising=False)
    import ast, inspect

    src = inspect.getsource(bench.supervise)
    # the default literal in the env lookup
    call = next(
        n for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.Call) and getattr(n.func, "attr", "") == "get"
        and n.args and getattr(n.args[0], "value", "") == "BENCH_TUNNEL_BUDGET_S"
    )
    assert call.args[1].value >= 3600 + 2700  # worst outage + one full run


def test_launch_overhead_probe_is_finite_and_small():
    """launch_overhead_s (the round-4 verdict item 1 per-launch probe) must
    return a sane marginal enqueue cost on any backend: positive (it clamps
    at 1e-9) and far below the per-corpus budget it is used to explain."""
    lo = bench.launch_overhead_s(samples=2, n=6)
    assert 0.0 < lo < 0.5
