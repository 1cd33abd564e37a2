"""Checkpoint eval-gate plumbing: verdict parsing, backlog skip, jsonl.

The verdict criterion is the honest one (VERDICT r2 next #1a): surviving
the window is not enough under a walk command — the policy must also
track >= 0.7x the commanded speed and end upright.
"""
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
        (100, "x.npz",
         _fake_proc("{'survived_s': 10.0, 'distance_m': 4.2, "
                    "'mean_speed': 0.42, 'final_base_z': 0.87}"),
         time.time()))
    gate._procs.append(
        (200, "y.npz",
         _fake_proc("{'survived_s': 4.5, 'distance_m': 0.8, "
                    "'mean_speed': 0.18, 'final_base_z': 0.3}"),
         time.time()))
    gate.wait_all(timeout=30)
    by_it = {r["iteration"]: r for r in gate.results}
    assert by_it[100]["passed"] is True
    assert by_it[200]["passed"] is False
    assert by_it[200]["criterion"] == "fell"
    lines = [json.loads(x) for x in
             open(tmp_path / "eval_gate.jsonl").read().splitlines()]
    assert {r["iteration"] for r in lines} == {100, 200}


def test_gate_standing_still_fails():
    """The committed round-2 'standing collapse' numbers must FAIL: a
    robot that survives 20 s but covers 0.05 m under cmd (0.5,0,0) was
    being waved through by the old survive-only criterion."""
    gate = CheckpointEvalGate("/tmp", duration=20.0)
    v = gate.verdict({"survived_s": 20.0, "distance_m": 0.05,
                      "mean_speed": 0.0025, "final_base_z": 0.88})
    assert v["passed"] is False
    assert "undertracked" in v["criterion"]


def test_gate_undertracking_fails():
    """Walking at ~half the commanded speed (the round-2 robust run's
    0.26-0.29 m/s under 0.5 m/s) fails the 0.7x tracking clause."""
    gate = CheckpointEvalGate("/tmp", duration=60.0)
    v = gate.verdict({"survived_s": 60.0, "distance_m": 16.2,
                      "mean_speed": 0.27, "final_base_z": 0.87})
    assert v["passed"] is False


def test_gate_crouched_fails():
    gate = CheckpointEvalGate("/tmp", duration=60.0)
    v = gate.verdict({"survived_s": 60.0, "distance_m": 24.0,
                      "mean_speed": 0.40, "final_base_z": 0.55})
    assert v["passed"] is False
    assert v["criterion"] == "crouched"


def test_gate_stand_command_survive_only():
    """Under a ~zero command the tracking clause is vacuous: surviving
    upright is the pass."""
    gate = CheckpointEvalGate("/tmp", duration=60.0, cmd=(0.0, 0.0, 0.0))
    assert gate.verdict({"survived_s": 60.0, "distance_m": 0.02,
                         "final_base_z": 0.9})["passed"] is True
    assert gate.verdict({"survived_s": 12.0})["passed"] is False


def test_gate_crash_is_fail(tmp_path):
    gate = CheckpointEvalGate(str(tmp_path), duration=10.0)
    gate._procs.append((1, "z.npz", _fake_proc("'boom'", rc=3), time.time()))
    gate.wait_all(timeout=30)
    assert gate.results[0]["passed"] is False


def test_gate_backlog_queues_not_skips(tmp_path, monkeypatch):
    """A checkpoint arriving while all replay slots are busy is QUEUED
    (round 2 skipped it and lost ~half the verdicts); the queue drains as
    slots free."""
    import humanoid_tpu.deploy.export as export_mod

    monkeypatch.setattr(export_mod, "export_policy_npz",
                        lambda params, path: path)
    gate = CheckpointEvalGate(str(tmp_path), duration=10.0, max_concurrent=0)

    class R:
        train_state = type("TS", (), {"params": None})()

    gate(R(), "ckpt", 300)
    assert gate._queue == [(300, str(tmp_path / "gate_policy_300.npz"))]
    assert gate.results == []     # no skip record
    # a slot opens -> the queued replay launches
    gate.max_concurrent = 1
    monkeypatch.setattr(
        gate, "_launch",
        lambda it, npz: gate._procs.append((it, npz, _fake_proc(
            "{'survived_s': 10.0, 'distance_m': 4.2, 'mean_speed': 0.42, "
            "'final_base_z': 0.9}"), time.time())),
    )
    gate.wait_all(timeout=30)
    assert gate.results and gate.results[0]["iteration"] == 300
    assert gate.results[0]["passed"] is True
