"""The 18-dof D11-style tasks (reference registers d11_ppo/d12_ppo but
ships neither the env modules nor the D11_X assets — SURVEY.md §0.1-0.2;
its config targets num_actions=18 / num_single_obs=65,
humanoid_config.py:47-55). Robot: XBot-L with the six arm dofs re-enabled
(assets.make_xbot18_urdf)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.assets import XBOT18_JOINT_ORDER, make_xbot18_urdf
from humanoid_tpu.config.structs import d11_cfg
from humanoid_tpu.env import XBotLEnv
from humanoid_tpu.utils import registry


@pytest.fixture(scope="module")
def env():
    cfg = d11_cfg()
    cfg = cfg.replace(env=dataclasses.replace(cfg.env, num_envs=8))
    return XBotLEnv(cfg)


def test_model_18dof(env):
    m = env.model
    assert m.nj == 18 and m.nb == 19
    assert tuple(m.joint_names) == XBOT18_JOINT_ORDER
    # arms lead the dof order; legs sit at +6 (humanoid_env.py:731-739)
    assert m.joint_names[6] == "left_leg_roll_joint"
    assert len(m.foot_bodies) == 2
    # the collapsed arm chain keeps its mass (forearm/wrist links fold into
    # the elbow body)
    assert float(np.sum(m.mass)) == pytest.approx(53.0, abs=1.0)


@pytest.mark.slow
def test_obs_layout_and_step(env):
    cfg = env.cfg
    assert cfg.env.num_single_obs == 5 + 3 * 18 + 6 == 65
    # cmd 5 | q/dq/act/diff 4x18 | lin+ang+euler 9 | push 5 | fric+mass 2
    # | stance+contact 4
    assert cfg.env.single_num_privileged_obs == 5 + 4 * 18 + 20 == 97
    key = jax.random.PRNGKey(0)
    s = env.initial_state(key)
    step = jax.jit(env.step)
    s, out = step(s, jnp.zeros((8, 18)), jax.random.PRNGKey(1))
    assert out.obs.shape == (8, 15 * 65)
    assert out.privileged_obs.shape == (8, 3 * 97)
    for i in range(30):
        s, out = step(s, jnp.zeros((8, 18)), jax.random.PRNGKey(i + 2))
    # stands (no termination) under zero action for 0.3 s
    assert not bool(jnp.any(out.reset))
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert float(jnp.min(s.phys.base_pos[:, 2])) > 0.7


def test_ref_dof_pos_leg_indices(env):
    """The gait reference drives leg pitch/knee/ankle at the +6-shifted
    indices and leaves the arms untouched."""
    el = jnp.full((8,), 16, dtype=jnp.int32)  # quarter cycle: sin=1
    ref = env._ref_dof_pos(el)
    s1 = env.cfg.rewards.target_joint_pos_scale
    # sin > 0 -> right leg swings (left stance at default)
    np.testing.assert_allclose(
        np.asarray(ref[0, [14, 15, 16]]), [s1, 2 * s1, s1], rtol=1e-5
    )
    assert float(jnp.abs(ref[:, :6]).max()) == 0.0
    assert float(jnp.abs(ref[:, [8, 9, 10]]).max()) == 0.0


def test_symmetry_perm_18():
    from humanoid_tpu.algo.symmetry import build_perm_matrix, xbot_perm_matrices

    obs_p, act_p = xbot_perm_matrices(frame_stack=15, nj=18)
    assert obs_p.shape == (15 * 65, 15 * 65)
    assert act_p.shape == (18, 18)
    # signed permutations are involutions: mirror(mirror(x)) == x
    np.testing.assert_allclose(act_p @ act_p, np.eye(18), atol=1e-6)
    np.testing.assert_allclose(obs_p @ obs_p, np.eye(15 * 65), atol=1e-6)


def test_registry_d11_d12():
    assert "d11_ppo" in registry.list_tasks()
    assert "d12_ppo" in registry.list_tasks()
    c11, _ = registry.get_cfgs("d11_ppo")
    c12, _ = registry.get_cfgs("d12_ppo")
    assert c11.env.num_actions == 18
    assert c12.commands.sw_switch and c12.domain_rand.randomize_lag_timesteps


@pytest.mark.slow
def test_d12_step_with_extensions():
    cfg, _ = registry.get_cfgs("d12_ppo")
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, num_envs=4),
        # feature-surface test; pin the cheap-compile contact model on CPU
        sim=dataclasses.replace(cfg.sim, contact_model="penalty"),
    )
    env = XBotLEnv(cfg)
    s = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(5):
        s, out = step(s, jnp.zeros((4, 18)), jax.random.PRNGKey(i))
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert s.lag_buffer.shape == (4, cfg.domain_rand.lag_timesteps + 1, 18)


def test_sim2sim_cfg_for_task():
    """Task-built replay config: 18-dof tasks get an MJCF exported from the
    compiled model (the shipped reference MJCF is 12-dof) with per-joint
    torque limits; XBot12 tasks keep the independent reference MJCF."""
    mujoco = pytest.importorskip("mujoco")
    from humanoid_tpu.deploy.sim2sim import cfg_for_task, run_mujoco

    cfg = cfg_for_task("d11_ppo", duration=0.5)
    assert cfg.num_actions == 18 and cfg.num_single_obs == 65
    assert len(cfg.tau_limit) == 18
    model = mujoco.MjModel.from_xml_path(cfg.mujoco_model_path)
    assert model.nu == 18
    m = run_mujoco(lambda obs: np.zeros(18), cfg, command=(0.0, 0.0, 0.0))
    assert m["survived_s"] > 0.2  # PD holds the default pose briefly

    cfg12 = cfg_for_task("humanoid_ppo", duration=0.5)
    assert cfg12.num_actions == 12
    assert "XBot-L.xml" in cfg12.mujoco_model_path


def test_urdf_generation_idempotent():
    p1 = make_xbot18_urdf()
    p2 = make_xbot18_urdf()
    assert p1 == p2
    src = open(p1).read()
    # exactly 18 revolute joints now
    import re

    assert len(re.findall(r'type="revolute"', src)) == 18
