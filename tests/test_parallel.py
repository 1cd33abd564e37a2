"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §5.8: env-axis DP is the complete communication surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.config.structs import (
    AlgorithmCfg,
    DomainRandCfg,
    EnvCfg,
    NoiseCfg,
    RunnerCfg,
    XBotLCfg,
    XBotLCfgPPO,
)
from humanoid_tpu.env import XBotLEnv
from humanoid_tpu.parallel.mesh import make_mesh, shard_env_pytree

pytestmark = pytest.mark.slow  # 8-virtual-device sharded training iterations: ~1.5 min


def _mini_setup(num_envs=16):
    cfg = XBotLCfg(env=EnvCfg(num_envs=num_envs))
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(num_steps_per_env=2),
        algorithm=AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1),
    )
    env = XBotLEnv(cfg)
    return env, tcfg


def test_mesh_creation():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.axis_names == ("env",)


def test_sharded_train_iteration():
    env, tcfg = _mini_setup()
    runner = OnPolicyRunner(env, tcfg)
    mesh = make_mesh(jax.devices()[:8])
    carry = runner.init_carry()
    carry = shard_env_pytree(carry, mesh, 16)
    # env-axis leaves sharded, params replicated
    shard = carry.env_state.phys.base_pos.sharding
    assert len(shard.device_set) == 8
    carry2, metrics = runner._train_iter(carry)
    jax.block_until_ready(carry2.train_state.params)
    assert np.isfinite(float(metrics.mean_step_reward))
    # output env state stays sharded across devices
    assert len(carry2.env_state.phys.base_pos.sharding.device_set) == 8


def test_sharded_matches_single_device():
    """One iteration sharded over 8 devices == unsharded, same seed
    (the collectives only change reduction grouping; fp32 tolerance)."""
    env, tcfg = _mini_setup()
    r1 = OnPolicyRunner(env, tcfg)
    c1 = r1.init_carry()
    c1_out, m1 = r1._train_iter(c1)

    r2 = OnPolicyRunner(env, tcfg)
    c2 = r2.init_carry()
    mesh = make_mesh(jax.devices()[:8])
    c2 = shard_env_pytree(c2, mesh, 16)
    c2_out, m2 = r2._train_iter(c2)

    np.testing.assert_allclose(
        float(m1.mean_step_reward), float(m2.mean_step_reward), atol=1e-5
    )
    p1 = jax.tree.leaves(c1_out.train_state.params)
    p2 = jax.tree.leaves(c2_out.train_state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=5e-4)
