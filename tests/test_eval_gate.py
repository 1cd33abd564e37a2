"""Checkpoint eval-gate plumbing: verdict parsing, backlog skip, jsonl."""
import json
import subprocess
import sys
import time

from humanoid_tpu.deploy.eval_gate import CheckpointEvalGate


def _fake_proc(stdout_line: str, rc: int = 0):
    code = f"import sys; print({stdout_line!r}); sys.exit({rc})"
    return subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )


def test_gate_pass_fail_parsing(tmp_path):
    gate = CheckpointEvalGate(str(tmp_path), duration=10.0)
    gate._procs.append(
        (100, "x.npz", _fake_proc("{'survived_s': 10.0, 'distance_m': 3.2}"),
         time.time()))
    gate._procs.append(
        (200, "y.npz", _fake_proc("{'survived_s': 4.5, 'distance_m': 0.8}"),
         time.time()))
    gate.wait_all(timeout=30)
    by_it = {r["iteration"]: r for r in gate.results}
    assert by_it[100]["passed"] is True
    assert by_it[200]["passed"] is False
    lines = [json.loads(x) for x in
             open(tmp_path / "eval_gate.jsonl").read().splitlines()]
    assert {r["iteration"] for r in lines} == {100, 200}


def test_gate_crash_is_fail(tmp_path):
    gate = CheckpointEvalGate(str(tmp_path), duration=10.0)
    gate._procs.append((1, "z.npz", _fake_proc("'boom'", rc=3), time.time()))
    gate.wait_all(timeout=30)
    assert gate.results[0]["passed"] is False


def test_gate_backlog_skips(tmp_path):
    gate = CheckpointEvalGate(str(tmp_path), duration=10.0, max_concurrent=0)

    class R:  # minimal runner stand-in; export should never be reached
        train_state = None

    gate(R(), "ckpt", 300)
    assert gate.results[0].get("skipped") is True
