"""Headless tests of the live-viewer control logic (scripts/view.py).

The window itself needs a display; ViewerSession (env stepping, keyboard
dispatch, command/push/reset state — the reference's base_task.py:154-178
event handling) is exercised without one.
"""
import numpy as np
import pytest

from humanoid_tpu.scripts.view import ViewerSession


@pytest.fixture(scope="module")
def session():
    return ViewerSession("humanoid_ppo", cmd=[0.5, 0.0, 0.0])


def test_step_returns_pose(session):
    pos, quat, qj = session.step()
    assert pos.shape == (3,) and quat.shape == (4,) and qj.shape == (12,)
    assert np.isfinite(pos).all() and 0.3 < pos[2] < 1.2


def test_keyboard_command_adjustment(session):
    session.cmd[:] = 0.0
    session.handle_key("w")
    session.handle_key("W")
    assert abs(session.cmd[0] - 0.2) < 1e-6
    session.handle_key("S")
    assert abs(session.cmd[0] - 0.1) < 1e-6
    session.handle_key("A")
    session.handle_key("Q")
    assert session.cmd[1] > 0 and session.cmd[2] > 0
    session.handle_key("Z")
    assert not session.cmd.any()
    # commands flow into the env state on the next step
    session.handle_key("W")
    session.step()
    assert float(session.state.commands[0, 0]) == pytest.approx(0.1)


def test_sync_toggle(session):
    s0 = session.sync
    session.handle_key("V")
    assert session.sync is (not s0)
    session.handle_key("V")
    assert session.sync is s0


def test_push_kicks_base_velocity(session):
    session.reset()
    v0 = np.asarray(session.state.phys.u[0, 3:5]).copy()
    session.handle_key("P")
    v1 = np.asarray(session.state.phys.u[0, 3:5])
    assert np.abs(v1 - v0).max() > 1e-4


@pytest.mark.slow
def test_reset_restores_height(session):
    # knock it over with pushes and steps, then reset
    for _ in range(3):
        session.push(magnitude=3.0)
        for _ in range(30):
            session.step()
    session.reset()
    pos, _, _ = session.step()
    assert pos[2] > 0.7
