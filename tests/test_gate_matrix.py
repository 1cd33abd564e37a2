"""Command-matrix gate (deploy/gate_matrix.py): cell definitions and the
directional-tracking judge, on synthetic trajectories (no MuJoCo replay —
the real matrix run on a trained policy is a committed validation
artifact, validation/*/gate_matrix.jsonl)."""
import math

import numpy as np

from humanoid_tpu.deploy.gate_matrix import (
    GateCell,
    default_cells,
    judge_cell,
)

DT = 0.01


def _states(duration, vel_fn, yaw_fn=lambda t: 0.0, z=0.95):
    """Fabricate run_mujoco-style state rows [qpos(7+)..] at 100 Hz."""
    n = int(duration / DT) + 1
    rows = []
    xy = np.zeros(2)
    for i in range(n):
        t = i * DT
        yaw = yaw_fn(t)
        q = np.array([math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)])
        rows.append(np.concatenate([xy, [z], q, np.zeros(12)]))
        xy = xy + np.asarray(vel_fn(t)) * DT
    return np.asarray(rows)


def _metrics(duration, z=0.95):
    return {"survived_s": duration, "final_base_z": z, "distance_m": 0.0,
            "mean_speed": 0.0}


def test_forward_cell_passes_on_tracking():
    cell = default_cells()[0]
    st = _states(cell.duration, lambda t: (0.45, 0.0))
    rec = judge_cell(cell, _metrics(cell.duration), st, DT)
    assert rec["passed"], rec


def test_backward_command_rejects_forward_walking():
    """|displacement|/time would wave this through; the directional judge
    must not."""
    cell = [c for c in default_cells() if c.name == "backward"][0]
    st = _states(cell.duration, lambda t: (0.3, 0.0))   # walking FORWARD
    rec = judge_cell(cell, _metrics(cell.duration), st, DT)
    assert not rec["passed"]
    st2 = _states(cell.duration, lambda t: (-0.25, 0.0))
    rec2 = judge_cell(cell, _metrics(cell.duration), st2, DT)
    assert rec2["passed"], rec2


def test_lateral_tracking_in_heading_frame():
    cell = [c for c in default_cells() if c.name == "lateral_left"][0]
    st = _states(cell.duration, lambda t: (0.0, 0.25))
    assert judge_cell(cell, _metrics(cell.duration), st, DT)["passed"]
    st2 = _states(cell.duration, lambda t: (0.0, -0.25))
    assert not judge_cell(cell, _metrics(cell.duration), st2, DT)["passed"]


def test_turn_cell_requires_yaw_rate():
    cell = [c for c in default_cells() if c.name == "turn_left"][0]
    # walking forward while turning at the commanded 0.3 rad/s: the path
    # curves, velocity rotates with the heading
    def vel(t):
        yaw = 0.3 * t
        return (0.35 * math.cos(yaw), 0.35 * math.sin(yaw))

    st = _states(cell.duration, vel, yaw_fn=lambda t: 0.3 * t)
    assert judge_cell(cell, _metrics(cell.duration), st, DT)["passed"]
    # no turn -> fail even though speed tracks
    st2 = _states(cell.duration, lambda t: (0.35, 0.0))
    assert not judge_cell(cell, _metrics(cell.duration), st2, DT)["passed"]


def test_stand_cell_bounds_drift():
    cell = [c for c in default_cells() if c.name == "stand"][0]
    st = _states(cell.duration, lambda t: (0.05, 0.0))   # 0.4 m drift
    assert judge_cell(cell, _metrics(cell.duration), st, DT)["passed"]
    st2 = _states(cell.duration, lambda t: (0.4, 0.0))   # 3.2 m "stand"
    assert not judge_cell(cell, _metrics(cell.duration), st2, DT)["passed"]


def test_stand_resume_segments():
    cell = [c for c in default_cells() if c.name == "stand_resume"][0]

    def vel(t):
        if t < 10.0 or t >= 18.0:
            return (0.45, 0.0)
        return (0.0, 0.0)

    st = _states(cell.duration, vel)
    rec = judge_cell(cell, _metrics(cell.duration), st, DT)
    assert rec["passed"], rec
    assert len(rec["segments"]) == 3

    def vel_no_resume(t):
        return (0.45, 0.0) if t < 10.0 else (0.0, 0.0)

    st2 = _states(cell.duration, vel_no_resume)
    assert not judge_cell(cell, _metrics(cell.duration), st2, DT)["passed"]


def test_fall_and_crouch_fail():
    cell = default_cells()[0]
    st = _states(cell.duration, lambda t: (0.45, 0.0))
    m = _metrics(cell.duration)
    m["survived_s"] = 3.2
    assert judge_cell(cell, m, st, DT)["criterion"] == "fell"
    m2 = _metrics(cell.duration, z=0.5)
    m2["final_base_z"] = 0.5
    assert judge_cell(cell, m2, st, DT)["criterion"] == "crouched"


def test_default_matrix_covers_reference_envelope():
    names = {c.name for c in default_cells()}
    assert {"forward", "backward", "lateral_left", "lateral_right",
            "turn_left", "turn_right", "stand", "stand_resume",
            "push_recovery"} <= names
    push = [c for c in default_cells() if c.name == "push_recovery"][0]
    # reference push magnitude (sim2sim.py FORCE_MAGNITUDE = 50 N) at the
    # training-push impulse scale, in all four horizontal directions
    assert len(push.pushes) == 4
    assert all(abs(np.linalg.norm(p[2])) == 50.0 for p in push.pushes)
