"""Unit tests of the reward bank against independent numpy re-implementations
of the reference formulas (humanoid_env.py:1170-1437) — SURVEY.md §7 hard
part #2 mitigation."""
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.config.structs import RewardsCfg
from humanoid_tpu.env import rewards as R


def make_ctx(rng, N=5, nj=12):
    cfg = RewardsCfg()
    contact = rng.rand(N, 2) > 0.5
    stance = (rng.rand(N, 2) > 0.5).astype(np.float32)
    ctx = R.RewardContext(
        dof_pos=jnp.array(rng.randn(N, nj) * 0.3),
        dof_vel=jnp.array(rng.randn(N, nj)),
        last_dof_vel=jnp.array(rng.randn(N, nj)),
        actions=jnp.array(rng.randn(N, nj)),
        last_actions=jnp.array(rng.randn(N, nj)),
        last_last_actions=jnp.array(rng.randn(N, nj)),
        torques=jnp.array(rng.randn(N, nj) * 50),
        ref_dof_pos=jnp.array(rng.randn(N, nj) * 0.1),
        default_dof_pos=jnp.zeros(nj),
        base_pos=jnp.array(rng.randn(N, 3) + np.array([0, 0, 0.9])),
        base_lin_vel=jnp.array(rng.randn(N, 3) * 0.5),
        base_ang_vel=jnp.array(rng.randn(N, 3) * 0.5),
        base_euler=jnp.array(rng.randn(N, 3) * 0.2),
        projected_gravity=jnp.array(rng.randn(N, 3) * 0.1),
        root_vel=jnp.array(rng.randn(N, 6)),
        last_root_vel=jnp.array(rng.randn(N, 6)),
        commands=jnp.array(rng.randn(N, 4) * 0.4),
        foot_pos=jnp.array(rng.randn(N, 2, 3) * 0.3),
        knee_pos=jnp.array(rng.randn(N, 2, 3) * 0.3),
        foot_ang_vel=jnp.array(rng.randn(N, 2, 3)),
        foot_forces=jnp.array(np.abs(rng.randn(N, 2, 3)) * 300),
        term_force=jnp.array(np.abs(rng.randn(N, 1))),
        contact=jnp.array(contact),
        stance_mask=jnp.array(stance),
        feet_air_time=jnp.array(np.abs(rng.randn(N, 2)) * 0.3),
        first_contact=jnp.array(rng.rand(N, 2) > 0.5),
        feet_height=jnp.array(np.abs(rng.randn(N, 2)) * 0.08),
        dt=0.01,
        cfg=cfg,
    )
    return ctx, cfg


@pytest.fixture
def ctx():
    return make_ctx(np.random.RandomState(0))


def test_joint_pos(ctx):
    c, _ = ctx
    diff = np.array(c.dof_pos) - np.array(c.ref_dof_pos)
    n = np.linalg.norm(diff, axis=1)
    expect = np.exp(-2 * n) - 0.2 * np.clip(n, 0, 0.5)
    np.testing.assert_allclose(np.array(R.joint_pos(c)), expect, rtol=1e-5)


def test_feet_distance(ctx):
    c, cfg = ctx
    fp = np.array(c.foot_pos)
    fd = np.linalg.norm(fp[:, 0, :2] - fp[:, 1, :2], axis=1)
    d_min = np.clip(fd - cfg.min_dist, -0.5, 0)
    d_max = np.clip(fd - cfg.max_dist, 0, 0.5)
    expect = (np.exp(-np.abs(d_min) * 100) + np.exp(-np.abs(d_max) * 100)) / 2
    np.testing.assert_allclose(np.array(R.feet_distance(c)), expect, rtol=1e-5)


def test_low_speed_cases():
    """Replicates the piecewise assignment order (humanoid_env.py:1370-1396):
    sign mismatch dominates; zero command zeroes everything."""
    rng = np.random.RandomState(1)
    c, _ = make_ctx(rng, N=6)
    # craft: [too_low, too_high, desired, mismatch, small cmd, desired-neg]
    vel = np.zeros((6, 3))
    cmd = np.zeros((6, 4))
    vel[0, 0], cmd[0, 0] = 0.1, 0.5     # too low -> -1
    vel[1, 0], cmd[1, 0] = 0.9, 0.5     # too high -> 0
    vel[2, 0], cmd[2, 0] = 0.5, 0.5     # desired -> 1.2
    vel[3, 0], cmd[3, 0] = -0.5, 0.5    # mismatch -> -2
    vel[4, 0], cmd[4, 0] = 0.1, 0.05    # |cmd| < 0.1 -> 0
    vel[5, 0], cmd[5, 0] = -0.5, -0.5   # desired, negative dir -> 1.2
    c = c._replace(base_lin_vel=jnp.array(vel), commands=jnp.array(cmd))
    np.testing.assert_allclose(
        np.array(R.low_speed(c)), [-1.0, 0.0, 1.2, -2.0, 0.0, 1.2], atol=1e-6
    )


def test_base_height_at_target():
    rng = np.random.RandomState(2)
    c, cfg = make_ctx(rng, N=1)
    # both feet stance at z=0.05 -> measured-0.05 = 0; base at target
    c = c._replace(
        stance_mask=jnp.ones((1, 2)),
        foot_pos=jnp.array([[[0.1, 0.1, 0.05], [0.1, -0.1, 0.05]]]),
        base_pos=jnp.array([[0.0, 0.0, cfg.base_height_target]]),
    )
    np.testing.assert_allclose(np.array(R.base_height(c)), [1.0], atol=1e-5)


def test_tracking_perfect():
    rng = np.random.RandomState(3)
    c, _ = make_ctx(rng, N=2)
    c = c._replace(
        base_lin_vel=jnp.concatenate(
            [c.commands[:, 0:2], jnp.zeros((2, 1))], axis=1
        ),
        base_ang_vel=jnp.concatenate(
            [jnp.zeros((2, 2)), c.commands[:, 2:3]], axis=1
        ),
    )
    np.testing.assert_allclose(np.array(R.tracking_lin_vel(c)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.array(R.tracking_ang_vel(c)), 1.0, atol=1e-5)


def test_feet_contact_number(ctx):
    c, _ = ctx
    match = np.array(c.contact) == np.array(c.stance_mask).astype(bool)
    expect = np.where(match, 1.0, -0.3).mean(axis=1)
    np.testing.assert_allclose(
        np.array(R.feet_contact_number(c)), expect, rtol=1e-6
    )


def test_action_smoothness(ctx):
    c, _ = ctx
    a, la, lla = map(np.array, (c.actions, c.last_actions, c.last_last_actions))
    expect = (
        ((la - a) ** 2).sum(1)
        + ((a + lla - 2 * la) ** 2).sum(1)
        + 0.05 * np.abs(a).sum(1)
    )
    np.testing.assert_allclose(
        np.array(R.action_smoothness(c)), expect, rtol=1e-5
    )


def test_feet_contact_forces(ctx):
    c, cfg = ctx
    f = np.linalg.norm(np.array(c.foot_forces), axis=-1)
    expect = np.clip(f - cfg.max_contact_force, 0, 400).sum(1)
    np.testing.assert_allclose(
        np.array(R.feet_contact_forces(c)), expect, rtol=1e-5
    )


def test_gait_updates_air_time():
    """feet_air_time accumulates in swing, pays out on first contact, resets
    while filtered-contact (humanoid_env.py:1222-1231)."""
    dt = 0.01
    contact = jnp.array([[False, True]])
    stance = jnp.zeros((1, 2))
    last_contacts = jnp.array([[False, False]])
    air = jnp.array([[0.3, 0.2]])
    (air_t, first, _), (new_air, new_last, _, _) = R.gait_updates(
        contact, stance, last_contacts, air,
        jnp.zeros((1, 2)), jnp.zeros((1, 2)), jnp.zeros((1, 2)), dt,
    )
    # foot 1 makes first contact after 0.2s air; foot 0 keeps flying
    np.testing.assert_allclose(np.array(first), [[False, True]])
    np.testing.assert_allclose(np.array(air_t), [[0.31, 0.21]], atol=1e-6)
    np.testing.assert_allclose(np.array(new_air), [[0.31, 0.0]], atol=1e-6)
    np.testing.assert_allclose(np.array(new_last), np.array(contact))


def test_build_table_prunes_zero_scales():
    names, fns, scales = R.build_reward_table(RewardsCfg(), 0.01)
    assert "termination" not in names and "stand_still" not in names
    assert len(names) == 22
    assert abs(dict(zip(names, scales))["joint_pos"] - 1.6 * 0.01) < 1e-9


def test_low_speed_directional_cases():
    """low_speed_directional (round 5): the band applies along the
    commanded xy direction, so lateral/backward commands get the same
    floor the deployment gate judges by."""
    import dataclasses

    rng = np.random.RandomState(1)
    c, cfg = make_ctx(rng, N=6)
    c = c._replace(
        cfg=dataclasses.replace(c.cfg, low_speed_directional=True)
    )
    vel = np.zeros((6, 3))
    cmd = np.zeros((6, 4))
    vel[0, 1], cmd[0, 1] = 0.1, 0.3      # lateral too low -> -1
    vel[1, 1], cmd[1, 1] = 0.5, 0.3      # lateral too high -> 0
    vel[2, 1], cmd[2, 1] = -0.25, -0.3   # lateral right, desired -> 1.2
    vel[3, 1], cmd[3, 1] = 0.2, -0.3     # wrong lateral side -> -2
    vel[4, 0], cmd[4, 0] = -0.25, -0.3   # backward desired -> 1.2
    vel[5, 1], cmd[5, 1] = 0.1, 0.05     # ||cmd|| < 0.1 -> 0
    c = c._replace(base_lin_vel=jnp.array(vel), commands=jnp.array(cmd))
    np.testing.assert_allclose(
        np.array(R.low_speed(c)), [-1.0, 0.0, 1.2, -2.0, 1.2, 0.0],
        atol=1e-6,
    )
    # default stays the reference's |vx|-only semantics: a pure lateral
    # command is inactive
    c0, _ = make_ctx(rng, N=1)
    v = np.zeros((1, 3)); cm = np.zeros((1, 4))
    v[0, 1], cm[0, 1] = 0.1, 0.3
    c0 = c0._replace(base_lin_vel=jnp.array(v), commands=jnp.array(cm))
    np.testing.assert_allclose(np.array(R.low_speed(c0)), [0.0], atol=1e-6)


def test_low_speed_overspeed_penalty():
    """low_speed_overspeed_r: the too_high branch's value is configurable
    (0 = reference shape; negative makes overspeed strictly bad)."""
    import dataclasses

    rng = np.random.RandomState(3)
    c, _ = make_ctx(rng, N=1)
    c = c._replace(
        cfg=dataclasses.replace(c.cfg, low_speed_directional=True,
                                low_speed_overspeed_r=-1.0)
    )
    v = np.zeros((1, 3)); cm = np.zeros((1, 4))
    v[0, 0], cm[0, 0] = 0.5, 0.3     # 1.67x overspeed
    c = c._replace(base_lin_vel=jnp.array(v), commands=jnp.array(cm))
    np.testing.assert_allclose(np.array(R.low_speed(c)), [-1.0], atol=1e-6)
