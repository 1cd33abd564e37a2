"""Generic legged-layer features (reference envs/base/legged_robot.py):
extended domain randomization, action-lag buffer, stand/walk switch with
gait scheduling, command curriculum, course_gain reward curriculum."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.config.structs import (
    AlgorithmCfg,
    CommandsCfg,
    DomainRandCfg,
    EnvCfg,
    RewardsCfg,
    RunnerCfg,
    XBotLCfg,
    XBotLCfgPPO,
)
from humanoid_tpu.env import XBotLEnv

N = 4


def make_env(**kw):
    cfg = XBotLCfg(env=EnvCfg(num_envs=N), **kw)
    return XBotLEnv(cfg), cfg


def test_dof_rand_ranges_and_shapes():
    env, cfg = make_env(
        domain_rand=DomainRandCfg(
            randomize_motor_strength=True,
            motor_strength_range=(0.8, 1.2),
            randomize_motor_offset=True,
            motor_offset_range=(-0.035, 0.035),
            randomize_kp_factor=True,
            randomize_kd_factor=True,
        )
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    # strength: one factor per env replicated across dofs
    # (legged_robot.py:377-381)
    assert np.allclose(np.ptp(np.asarray(s.motor_strengths), axis=1), 0.0)
    assert np.all(np.asarray(s.motor_strengths) >= 0.8)
    assert np.all(np.asarray(s.motor_strengths) <= 1.2)
    # offsets: per-dof
    mo = np.asarray(s.motor_offsets)
    assert np.abs(mo).max() <= 0.035 and np.ptp(mo, axis=1).max() > 0
    # re-randomized on the interval grid
    s2, _ = jax.jit(env.step)(
        s._replace(
            episode_length=jnp.full(N, env.dof_rand_interval - 1, jnp.int32)
        ),
        jnp.zeros((N, env.nj)),
        jax.random.PRNGKey(1),
    )
    assert not np.allclose(
        np.asarray(s2.motor_offsets), mo
    ), "dof props must resample when episode_length hits the interval"


def test_body_randomization():
    env, cfg = make_env(
        domain_rand=DomainRandCfg(
            randomize_link_mass=True,
            link_mass_range=(0.9, 1.1),
            randomize_base_com=True,
            randomize_inertia=True,
            inertia_range=(0.8, 1.2),
        )
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    m0 = np.asarray(env.model.mass)
    masses = np.asarray(s.masses)
    # non-base rows scaled by one per-env factor (legged_robot.py:326-329)
    fac = masses[:, 1:] / m0[1:]
    assert np.allclose(np.ptp(fac, axis=1), 0.0, atol=1e-6)
    assert np.all(fac >= 0.9 - 1e-6) and np.all(fac <= 1.1 + 1e-6)
    # base COM offset within config ranges, other bodies unchanged
    com = np.asarray(s.body_com)
    d = com[:, 0] - np.asarray(env.model.com)[0]
    assert np.all(d[:, 0] >= -0.07) and np.all(d[:, 0] <= 0.03)
    assert np.allclose(com[:, 1:], np.asarray(env.model.com)[None, 1:])
    # inertia stays symmetric under the element factors
    inertia = np.asarray(s.body_inertia)
    assert np.allclose(inertia, np.swapaxes(inertia, -1, -2))
    # and the randomized bodies still step stably
    s2, out = jax.jit(env.step)(
        s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(1)
    )
    assert np.all(np.isfinite(np.asarray(out.obs)))


def test_lag_buffer_shift_and_reset():
    env, cfg = make_env(
        domain_rand=DomainRandCfg(
            randomize_lag_timesteps=True, lag_timesteps=3, action_delay=False,
            dynamic_randomization=0.0,
        )
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.ones((N, env.nj)) * 0.1
    s, _ = step(s, a, jax.random.PRNGKey(1))
    # newest slot holds the scaled action (legged_robot.py:486)
    assert np.allclose(
        np.asarray(s.lag_buffer[:, -1]),
        0.1 * cfg.control.action_scale,
        atol=1e-6,
    )
    assert np.allclose(np.asarray(s.lag_buffer[:, :-2]), 0.0)
    # forced reset clears the ring
    s_term = s._replace(
        episode_length=jnp.full(N, env.max_episode_length + 1, jnp.int32)
    )
    s2, out = step(s_term, a, jax.random.PRNGKey(2))
    assert bool(out.reset.all())
    assert np.allclose(np.asarray(s2.lag_buffer), 0.0)


@pytest.mark.slow
def test_sw_switch_stand_freezes_phase():
    env, cfg = make_env(
        commands=CommandsCfg(
            sw_switch=True, static_delay=3, gait=("stand",),
            heading_command=False,
        ),
        domain_rand=DomainRandCfg(push_robots=False),
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    # force zero commands everywhere -> stand counter accumulates
    s = s._replace(commands=jnp.zeros((N, 4)))
    step = jax.jit(env.step)
    for i in range(8):
        s, out = step(s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(10 + i))
        s = s._replace(commands=jnp.zeros((N, 4)))
    assert np.all(np.asarray(s.time_to_stand_still) > 3)
    # phase counter frozen at zero -> no gait signal, double support
    assert np.all(np.asarray(s.phase_length_buf) == 0)
    K = cfg.env.num_single_obs
    last = np.asarray(out.obs)[:, -K:]
    assert np.allclose(last[:, 0], 0.0, atol=0.1), "sin(phase) ~ 0 standing"


@pytest.mark.slow
def test_sw_switch_walk_command_unfreezes_phase():
    """Regression for the absorbing stand state (scripts_dev/
    robust_bisect.py): after the stand timer passes static_delay (phase
    frozen), issuing a walk command must RESET the timer and restart the
    gait clock even though the robot is still below the 0.3 m/s low-speed
    threshold — the deploy-side semantics (sim2sim.py:201-208). The old
    base-class form (legged_robot.py:397-398) kept the timer alive under
    a walk command while slow, so the gait signal never returned."""
    env, cfg = make_env(
        commands=CommandsCfg(
            sw_switch=True, static_delay=3, gait=("stand",),
            heading_command=False,
        ),
        domain_rand=DomainRandCfg(push_robots=False),
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    s = s._replace(commands=jnp.zeros((N, 4)))
    step = jax.jit(env.step)
    for i in range(8):
        s, _ = step(s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(20 + i))
        s = s._replace(commands=jnp.zeros((N, 4)))
    assert np.all(np.asarray(s.time_to_stand_still) > 3)
    assert np.all(np.asarray(s.phase_length_buf) == 0)
    # now command 0.5 m/s forward (robot still at ~zero speed)
    walk = jnp.tile(jnp.array([[0.5, 0.0, 0.0, 0.0]]), (N, 1))
    s = s._replace(commands=walk)
    for i in range(3):
        s, _ = step(s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(40 + i))
        s = s._replace(commands=walk)
    assert np.all(np.asarray(s.time_to_stand_still) == 0.0)
    assert np.all(np.asarray(s.phase_length_buf) >= 3), (
        "gait clock must restart under a walk command"
    )


def test_gait_time_schedule():
    env, _ = make_env(
        commands=CommandsCfg(
            sw_switch=True, gait=("walk_omnidirectional", "stand"),
        )
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    gt = np.asarray(s.gait_time)
    assert gt.shape == (N, 2)
    T = env.max_episode_length
    assert np.all(gt[:, 0] >= 1) and np.all(gt[:, 0] <= T // 2)
    assert np.all(gt[:, 1] > T // 2) and np.all(gt[:, 1] <= T)
    # hitting a stand switch time zeroes the command
    s = s._replace(
        gait_time=jnp.tile(jnp.array([[5, 6]], dtype=jnp.int32), (N, 1)),
        episode_length=jnp.full(N, 5, jnp.int32),
    )
    s2, _ = jax.jit(env.step)(
        s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(3)
    )
    cmds = np.asarray(s2.commands)
    # vx/vy/heading zeroed; the heading controller recomputes a tiny wyaw
    # from the residual heading error (legged_robot.py:405-407)
    assert np.allclose(cmds[:, [0, 1, 3]], 0.0)
    assert np.all(np.abs(cmds[:, 2]) < 0.05)


def test_command_curriculum_widens():
    env, cfg = make_env(
        commands=CommandsCfg(curriculum=True, max_curriculum=2.0),
        noise=None or XBotLCfg().noise,
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    lo0, hi0 = np.asarray(s.cmd_x_range)
    track_scale = env.reward_scales[env.track_idx]
    # craft: all envs time out this step at a common_step multiple of the
    # horizon, with tracking sums above the 80% threshold
    T = env.max_episode_length
    sums = jnp.zeros((N, env.n_rew)).at[:, env.track_idx].set(
        0.9 * track_scale * T
    )
    s = s._replace(
        episode_length=jnp.full(N, T + 1, jnp.int32),
        common_step=jnp.asarray(T - 1, jnp.int32),
        episode_sums=sums,
    )
    s2, out = jax.jit(env.step)(
        s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(1)
    )
    assert bool(out.reset.all())
    lo1, hi1 = np.asarray(s2.cmd_x_range)
    assert lo1 == pytest.approx(max(lo0 - 0.5, -2.0))
    assert hi1 == pytest.approx(min(hi0 + 0.5, 2.0))
    # and fresh commands obey the widened range (vx sampled from state)
    assert np.all(np.asarray(s2.commands)[:, 0] >= lo1 - 1e-6)
    assert np.all(np.asarray(s2.commands)[:, 0] <= hi1 + 1e-6)


@pytest.mark.slow
def test_course_gain_curriculum():
    from humanoid_tpu.algo.runner import OnPolicyRunner

    cfg = XBotLCfg(
        env=EnvCfg(num_envs=N), rewards=RewardsCfg(course_ratio=1.5)
    )
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(num_steps_per_env=2),
        algorithm=AlgorithmCfg(num_mini_batches=1, num_learning_epochs=1),
    )
    env = XBotLEnv(cfg)
    runner = OnPolicyRunner(env, tcfg)
    carry = runner.learn(3, log_fn=None)
    g = float(carry.env_state.course_gain)
    assert g == pytest.approx(1.5**3, rel=1e-5)
    # capped at 20 (on_policy_runner.py:162)
    carry = runner.learn(10, carry=carry)
    assert float(carry.env_state.course_gain) == pytest.approx(20.0)


def test_measure_heights_priv_obs():
    """17x11 height scan appended to the critic obs on heightfield terrain
    (legged_robot_config.py:54-56, humanoid_env.py:871-874)."""
    import dataclasses

    from humanoid_tpu.utils import registry

    cfg0, _ = registry.get_cfgs("humanoid_ppo_terrain")
    cfg0 = cfg0.replace(
        env=dataclasses.replace(cfg0.env, num_envs=N),
        # obs-layout test; pin the cheap-compile contact model on CPU
        sim=dataclasses.replace(cfg0.sim, contact_model="penalty"),
    )
    env, _ = registry.make_env("humanoid_ppo_terrain", env_cfg=cfg0)
    assert env.n_height_points == 17 * 11
    s = env.initial_state(jax.random.PRNGKey(0))
    s, out = jax.jit(env.step)(s, jnp.zeros((N, env.nj)), jax.random.PRNGKey(1))
    K = cfg0.env.c_frame_stack * cfg0.env.single_num_privileged_obs
    assert out.privileged_obs.shape == (N, K)
    # height channels are clipped to +-1 * scale
    hp = np.asarray(out.privileged_obs)[:, -env.n_height_points:]
    scale = cfg0.normalization.obs_scales.height_measurements
    assert np.all(np.abs(hp) <= scale + 1e-5)
    assert np.all(np.isfinite(np.asarray(out.privileged_obs)))


@pytest.mark.slow
def test_terrain_exploration_tier():
    """random_level_frac: resetting envs draw uniform random difficulty
    rows (the exploration tier past the reference's +-1 game curriculum);
    frac=0 keeps the pure game step."""
    import dataclasses

    from humanoid_tpu.utils import registry

    def run(frac, seed=0):
        cfg0, _ = registry.get_cfgs("humanoid_ppo_terrain")
        cfg0 = cfg0.replace(
            env=dataclasses.replace(
                cfg0.env, num_envs=N, episode_length_s=0.05
            ),  # 5-step episodes -> every env resets every 5 steps
            sim=dataclasses.replace(cfg0.sim, contact_model="penalty"),
            terrain=dataclasses.replace(
                cfg0.terrain, random_level_frac=frac,
                max_init_terrain_level=1,   # all start at level 0
                curriculum_mode="displacement",  # pin the game rule
            ),
        )
        env, _ = registry.make_env("humanoid_ppo_terrain", env_cfg=cfg0)
        s = env.initial_state(jax.random.PRNGKey(seed))
        step = jax.jit(env.step)
        k = jax.random.PRNGKey(seed + 1)
        for i in range(12):
            k, ke = jax.random.split(k)
            s, out = step(s, jnp.zeros((N, env.nj)), ke)
        return np.asarray(s.terrain_levels)

    lv0 = run(0.0)
    lv1 = run(1.0)
    # pure game curriculum from level 0: short timeout episodes walk no
    # distance -> move_down clamps at 0, so levels stay at 0
    assert lv0.max() <= 1, lv0
    # full exploration tier: after 2 resets levels spread over all rows
    assert lv1.max() >= 6 and len(np.unique(lv1)) >= 4, lv1


@pytest.mark.slow
def test_terrain_tracking_curriculum():
    """curriculum_mode="tracking" (round 5): clean-timeout episodes with
    good tracking promote; stand commands cannot promote; falls demote
    with demote_prob resistance. Verified through the real step path by
    steering episode_sums/commands just before the reset."""
    import dataclasses

    from humanoid_tpu.utils import registry

    cfg0, _ = registry.get_cfgs("humanoid_ppo_terrain")
    cfg0 = cfg0.replace(
        env=dataclasses.replace(
            cfg0.env, num_envs=N, episode_length_s=0.05
        ),  # 5-step episodes -> every env resets (by timeout) every 5 steps
        sim=dataclasses.replace(cfg0.sim, contact_model="penalty"),
        noise=dataclasses.replace(cfg0.noise, add_noise=False),
        terrain=dataclasses.replace(
            cfg0.terrain, random_level_frac=0.0,
            max_init_terrain_level=0,     # all start at level 0
            # (init draws randint(0, max_init+1))
            curriculum_mode="tracking",
            promote_quality=0.55, demote_prob=0.5,
        ),
    )
    env, _ = registry.make_env("humanoid_ppo_terrain", env_cfg=cfg0)
    step = jax.jit(env.step)
    track = env.reward_names.index("tracking_lin_vel")
    scale = env.reward_scales[track]

    def run_epoch(s, key, q, walk):
        """Force tracking quality q and command type just before each
        timeout reset, then count level movement."""
        for i in range(6):
            key, ke = jax.random.split(key)
            # steer the episode_sums/commands the curriculum will read
            sums = s.episode_sums.at[:, track].set(
                q * scale * (np.asarray(s.episode_length) + 1)
            )
            cmds = s.commands.at[:, 0].set(0.4 if walk else 0.0)
            cmds = cmds.at[:, 1:3].set(0.0)
            s = s._replace(episode_sums=sums, commands=cmds)
            s, out = step(s, jnp.zeros((N, env.nj)), ke)
        return s, key

    # 1) walking with good tracking -> promote on every timeout
    s = env.initial_state(jax.random.PRNGKey(0))
    s, _ = run_epoch(s, jax.random.PRNGKey(1), q=0.9, walk=True)
    lv_good = np.asarray(s.terrain_levels)
    assert lv_good.mean() >= 0.9, lv_good.mean()

    # 2) standing with perfect tracking -> NO promotion
    s = env.initial_state(jax.random.PRNGKey(0))
    s, _ = run_epoch(s, jax.random.PRNGKey(1), q=1.0, walk=False)
    lv_stand = np.asarray(s.terrain_levels)
    assert lv_stand.max() == 0, lv_stand.max()

    # 3) walking with poor tracking -> no promotion (and no demotion:
    # timeouts never demote in tracking mode)
    s = env.initial_state(jax.random.PRNGKey(0))
    s, _ = run_epoch(s, jax.random.PRNGKey(1), q=0.2, walk=True)
    lv_poor = np.asarray(s.terrain_levels)
    assert lv_poor.max() == 0, lv_poor.max()
