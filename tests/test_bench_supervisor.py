"""bench.py supervisor: retry + JSON forwarding logic (no jax needed)."""

import json
import subprocess
import sys

import bench


class _Res:
    def __init__(self, rc, out):
        self.returncode = rc
        self.stdout = out.encode()


def test_forwards_first_successful_json(monkeypatch, capsys):
    line = json.dumps({"metric": "m", "value": 1.0})
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        assert cmd[0] == sys.executable
        assert kw["timeout"] == bench._ATTEMPT_TIMEOUT_S
        assert kw["env"][bench._CHILD_ENV] == "1"
        return _Res(0, f"some warning\n{line}\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip() == line
    assert len(calls) == 1


def test_retries_on_timeout_then_succeeds(monkeypatch, capsys):
    line = json.dumps({"metric": "m", "value": 2.0})
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, kw["timeout"])
        return _Res(0, line + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    cap = capsys.readouterr()
    assert cap.out.strip() == line
    assert "timed out" in cap.err
    assert state["n"] == 2


def test_fails_after_all_attempts(monkeypatch, capsys):
    def fake_run(cmd, **kw):
        return _Res(1, "crash, no json\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 1
    cap = capsys.readouterr()
    assert cap.out == ""  # never forwards garbage
    assert cap.err.count("failed rc=1") == bench._ATTEMPTS


def test_rc0_without_json_is_a_failure(monkeypatch, capsys):
    """A child that exits 0 but prints no metric line must not count."""
    def fake_run(cmd, **kw):
        return _Res(0, "no json here\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 1
    assert capsys.readouterr().out == ""
