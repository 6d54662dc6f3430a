"""bench.py outage contract: exactly ONE JSON line on stdout even when the
TPU tunnel is down (VERDICT r4 #2 — round 4's bench artifact died rc:124
sleeping inside an in-process retry during a confirmed multi-hour outage).
"""

import json

import pytest

from lstc_vad_tpu import benchmark


def _stdout_json_lines(capsys):
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    return lines, [json.loads(ln) for ln in lines]


def test_outage_prints_single_explicit_json_line(capsys):
    """Confirmed-down tunnel (probe fails twice): one parseable JSON line
    with the contract keys, null value, and the transient_outage marker."""
    benchmark.main(retry_wait_s=0.0,
                   probe=lambda: (False, "UNAVAILABLE: tunnel down"),
                   runner=lambda: pytest.fail("runner must not start"))
    lines, parsed = _stdout_json_lines(capsys)
    assert len(lines) == 1
    (rec,) = parsed
    assert rec["metric"] == "sht_ltn_eval_snippets_per_sec"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["transient_outage"] is True
    assert "UNAVAILABLE" in rec["outage_detail"]
    # per-key consumers must see None, never KeyError: every success-path
    # contract key is present on the outage line too
    missing = set(benchmark.CONTRACT_KEYS) - set(rec)
    assert not missing, f"outage line lacks contract keys: {missing}"
    assert all(rec[k] is None for k in benchmark.CONTRACT_KEYS
               if k not in ("metric", "unit"))


def test_probe_blip_recovers_and_runs(capsys):
    """First probe fails, second succeeds: the measurement still runs."""
    results = iter([(False, "blip"), (True, "")])
    ran = []
    benchmark.main(retry_wait_s=0.0, probe=lambda: next(results),
                   runner=lambda: ran.append(1))
    assert ran == [1]
    assert capsys.readouterr().out == ""  # runner owns the JSON line


def test_midrun_transient_after_reexec_prints_outage(capsys, monkeypatch):
    """A transient failure in the already-retried process (LSTC_BENCH_RETRY
    set) with the device CONFIRMED unreachable must emit the outage line
    instead of raising or re-exec looping."""
    monkeypatch.setenv("LSTC_BENCH_RETRY", "1")
    probes = iter([(True, ""), (False, "UNAVAILABLE: still down")])

    def runner():
        raise RuntimeError("UNAVAILABLE: backend setup/compile error")

    benchmark.main(retry_wait_s=0.0, probe=lambda: next(probes),
                   runner=runner)
    lines, parsed = _stdout_json_lines(capsys)
    assert len(lines) == 1
    assert parsed[0]["transient_outage"] is True


def test_persistent_error_on_reachable_device_raises(monkeypatch):
    """A 'transient-looking' error that persists across the re-exec while
    the device IS reachable (e.g. a genuine HBM OOM raising
    RESOURCE_EXHAUSTED) must raise, not be laundered into an outage line."""
    monkeypatch.setenv("LSTC_BENCH_RETRY", "1")

    def runner():
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory on HBM")

    with pytest.raises(RuntimeError, match="Out of memory"):
        benchmark.main(retry_wait_s=0.0, probe=lambda: (True, ""),
                       runner=runner)


def test_midrun_nontransient_still_raises(monkeypatch):
    """Real bugs must not be laundered into outage lines."""
    monkeypatch.delenv("LSTC_BENCH_RETRY", raising=False)

    def runner():
        raise ValueError("genuine bug")

    with pytest.raises(ValueError, match="genuine bug"):
        benchmark.main(retry_wait_s=0.0, probe=lambda: (True, ""),
                       runner=runner)


def test_midrun_transient_reexecs_interpreter_by_abspath(monkeypatch):
    """First transient failure re-execs sys.executable (orig_argv[0] is a
    bare 'python' that os.execv would not find — ADVICE r4 #1)."""
    import os
    import sys

    monkeypatch.delenv("LSTC_BENCH_RETRY", raising=False)
    calls = []
    monkeypatch.setattr(os, "execv",
                        lambda exe, argv: calls.append((exe, argv)))

    def runner():
        raise RuntimeError("RESOURCE_EXHAUSTED: device grant wedged")

    benchmark.main(retry_wait_s=0.0, probe=lambda: (True, ""), runner=runner)
    assert calls and calls[0][0] == sys.executable
    assert calls[0][1][0] == sys.executable
    assert os.environ.get("LSTC_BENCH_RETRY") == "1"
