"""Environment-layer tests: obs layout, step semantics, auto-reset,
determinism (reference env contract, SURVEY.md §3.4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.config.structs import (
    DomainRandCfg,
    EnvCfg,
    NoiseCfg,
    XBotLCfg,
)
from humanoid_tpu.env import XBotLEnv

N = 4


@pytest.fixture(scope="module")
def quiet_env():
    """Deterministic env: no noise, no pushes, no action randomization."""
    cfg = XBotLCfg(
        env=EnvCfg(num_envs=N),
        noise=NoiseCfg(add_noise=False),
        domain_rand=DomainRandCfg(
            randomize_friction=False, randomize_base_mass=False,
            push_robots=False, dynamic_randomization=0.0, action_delay=False,
        ),
    )
    return XBotLEnv(cfg)


@pytest.fixture(scope="module")
def stepped(quiet_env):
    env = quiet_env
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(1))
    return env, step, state, out


def test_shapes_and_contract(stepped):
    env, step, state, out = stepped
    assert out.obs.shape == (N, 15 * 47)
    assert out.privileged_obs.shape == (N, 3 * 73)
    assert out.rew.shape == (N,)
    assert out.reset.shape == (N,) and out.reset.dtype == bool
    assert out.time_outs.shape == (N,)
    assert float(jnp.abs(out.obs).max()) <= 18.0


def test_single_frame_layout(stepped):
    """Actor obs frame = [sin, cos, cmd*scale | q | dq | a | w | euler]
    (humanoid_env.py:862-869); newest frame is the last 47 slots."""
    env, step, state, out = stepped
    frame = np.array(out.obs[:, -47:])
    phase = np.array(state.episode_length, np.float32) * env.dt / 0.64
    np.testing.assert_allclose(frame[:, 0], np.sin(2 * np.pi * phase), atol=1e-5)
    np.testing.assert_allclose(frame[:, 1], np.cos(2 * np.pi * phase), atol=1e-5)
    cmds = np.array(state.commands)
    np.testing.assert_allclose(frame[:, 2], cmds[:, 0] * 2.0, atol=1e-5)
    np.testing.assert_allclose(frame[:, 3], cmds[:, 1] * 2.0, atol=1e-5)
    np.testing.assert_allclose(frame[:, 4], cmds[:, 2] * 1.0, atol=1e-5)
    np.testing.assert_allclose(
        frame[:, 5:17], np.array(state.phys.qj), atol=1e-5
    )
    np.testing.assert_allclose(
        frame[:, 17:29], np.array(state.phys.u[:, 6:]) * 0.05, atol=1e-5
    )
    # zero actions this step
    np.testing.assert_allclose(frame[:, 29:41], 0.0, atol=1e-6)


def test_privileged_frame_layout(stepped):
    env, step, state, out = stepped
    frame = np.array(out.privileged_obs[:, -73:])
    # layout: cmd5|q12|dq12|a12|diff12|lin3|ang3|euler3|pushF2|pushT3|
    # friction1|mass1|stance2|contact2 -> friction at 67 (= '53:56' lin-vel
    # slice + 3+3+2+3, rollout_storage.py:164 convention)
    np.testing.assert_allclose(frame[:, 67], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        frame[:, 68], env.model.mass[0] / 30.0, rtol=1e-5
    )
    # stance mask entries are 0/1
    assert set(np.round(frame[:, 69:71].ravel(), 5)).issubset({0.0, 1.0})
    # vel-estimator target slice (oldest frame) holds scaled base lin vel
    vel_slice = np.array(out.privileged_obs[:, 53:56])
    assert np.isfinite(vel_slice).all()


def test_determinism(quiet_env):
    env = quiet_env
    step = jax.jit(env.step)
    s0 = env.initial_state(jax.random.PRNGKey(7))
    a = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (N, 12))
    s1, o1 = step(s0, a, jax.random.PRNGKey(9))
    s2, o2 = step(s0, a, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.array(o1.obs), np.array(o2.obs))
    np.testing.assert_array_equal(np.array(o1.rew), np.array(o2.rew))


def test_auto_reset_on_fall(quiet_env):
    env = quiet_env
    step = jax.jit(env.step)
    state = env.initial_state(jax.random.PRNGKey(0))
    state, _ = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(1))
    # knock env 0 over: base at ground, tipped
    state = state._replace(
        phys=state.phys._replace(
            base_pos=state.phys.base_pos.at[0, 2].set(0.03),
            base_quat=state.phys.base_quat.at[0].set(
                jnp.array([0.707, 0.707, 0.0, 0.0])
            ),
        )
    )
    state2, out = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(2))
    assert bool(out.reset[0]) and not bool(out.reset[1])
    assert float(out.ep_count) == 1.0
    # reset env back at spawn with zeroed histories except newest frame
    assert float(state2.phys.base_pos[0, 2]) > 0.9
    assert int(state2.episode_length[0]) == 0
    oh = np.array(state2.obs_hist[0])
    assert np.abs(oh[:-1]).max() == 0.0 and np.abs(oh[-1]).max() > 0.0
    # time_outs flag separated from failures (for bootstrapping)
    assert not bool(out.time_outs[0])


def test_timeout_reset(quiet_env):
    env = quiet_env
    step = jax.jit(env.step)
    state = env.initial_state(jax.random.PRNGKey(0))
    state = state._replace(
        episode_length=jnp.full((N,), env.max_episode_length, jnp.int32)
    )
    state2, out = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(3))
    assert bool(out.time_outs.all()) and bool(out.reset.all())


def test_command_resample_on_schedule(quiet_env):
    env = quiet_env
    step = jax.jit(env.step)
    state = env.initial_state(jax.random.PRNGKey(0))
    state, _ = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(1))
    cmds_before = np.array(state.commands)
    # jump to one step before the resample boundary
    state = state._replace(
        episode_length=jnp.full((N,), env.resample_steps - 1, jnp.int32)
    )
    state2, _ = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(2))
    cmds_after = np.array(state2.commands)
    # vx/vy redrawn (heading-mode cmd[2] is recomputed every step anyway)
    assert np.abs(cmds_after[:, :2] - cmds_before[:, :2]).max() > 1e-6


def test_push_applies_velocity():
    cfg = XBotLCfg(
        env=EnvCfg(num_envs=N),
        noise=NoiseCfg(add_noise=False),
        domain_rand=DomainRandCfg(
            randomize_friction=False, randomize_base_mass=False,
            push_robots=True, dynamic_randomization=0.0, action_delay=False,
        ),
    )
    env = XBotLEnv(cfg)
    step = jax.jit(env.step)
    state = env.initial_state(jax.random.PRNGKey(0))
    state = state._replace(
        common_step=jnp.asarray(env.push_interval - 1, jnp.int32)
    )
    state2, _ = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(5))
    assert np.abs(np.array(state2.push_force)).max() > 0.0


def test_nan_state_detected_and_reset(quiet_env):
    """Failure detection (round 5): a physics blow-up (non-finite state)
    must terminate and reset that env, zero its reward row, and leave
    every output finite — one NaN reward otherwise reaches the GLOBAL
    advantage normalization and kills the whole run's parameters
    (observed live: trimesh+DR run NaN'd at iter 350 and trained dead)."""
    env = quiet_env
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(1))
    u = state.phys.u.at[0, 3].set(jnp.nan)      # env 0 blows up
    qj = state.phys.qj.at[2, 5].set(jnp.inf)    # env 2 too (Inf)
    # env 3: finite but physically absurd (passes isfinite, would put
    # 1e10-scale garbage in reward telemetry before overflowing)
    u = u.at[3, 4].set(1e6)
    state = state._replace(phys=state.phys._replace(u=u, qj=qj))
    state2, out = step(state, jnp.zeros((N, 12)), jax.random.PRNGKey(2))
    r = np.asarray(out.reset)
    assert r[0] and r[2] and r[3], "non-finite/absurd envs must reset"
    rew = np.asarray(out.rew)
    assert rew[0] == 0.0 and rew[2] == 0.0
    assert np.all(np.isfinite(rew))
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.all(np.isfinite(np.asarray(out.privileged_obs)))
    # the replacement state is clean and steppable
    for leaf in (state2.phys.base_pos, state2.phys.base_quat,
                 state2.phys.qj, state2.phys.u):
        assert np.all(np.isfinite(np.asarray(leaf)))
    _, out3 = step(state2, jnp.zeros((N, 12)), jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(out3.rew)))
