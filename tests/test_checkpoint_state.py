"""Exact-state checkpointing (superset of the reference: on_policy_runner
.py:293-310 persists model+optimizer only, so resume re-initializes every
env and loses curriculum/episode/RNG progress).

The contract under test: save_state at iteration k, restore into a fresh
runner, run the remaining iterations -> bitwise-identical params to the
uninterrupted run (same dispatch chunking)."""
import dataclasses
import os

import jax
import numpy as np
import pytest

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.config.structs import (
    AlgorithmCfg,
    EnvCfg,
    RunnerCfg,
    XBotLCfg,
    XBotLCfgPPO,
)
from humanoid_tpu.env import XBotLEnv


def _cfgs(save_env_state=False):
    cfg = XBotLCfg(env=EnvCfg(num_envs=4))
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(
            num_steps_per_env=4,
            save_interval=2,
            iters_per_dispatch=1,   # identical dispatch chunking on both
            save_env_state=save_env_state,
        ),
        algorithm=AlgorithmCfg(num_learning_epochs=1, num_mini_batches=2),
    )
    return cfg, tcfg


def _leaves(params):
    return [np.asarray(x) for x in jax.tree.leaves(params)]


@pytest.mark.slow
def test_exact_state_resume_bitwise(tmp_path):
    cfg, tcfg = _cfgs()

    # uninterrupted run: 4 iterations, no checkpointing
    env = XBotLEnv(cfg)
    ref = OnPolicyRunner(env, tcfg)
    ref_carry = ref.learn(4, init_at_random_ep_len=True)

    # interrupted run: 2 iterations with exact-state checkpoints...
    cfg2, tcfg2 = _cfgs(save_env_state=True)
    env2 = XBotLEnv(cfg2)
    a = OnPolicyRunner(env2, tcfg2, log_dir=str(tmp_path / "run"))
    a.learn(2, init_at_random_ep_len=True)
    state_path = tmp_path / "run" / "state_2"
    assert state_path.is_dir(), sorted(os.listdir(tmp_path / "run"))

    # ...restored into a FRESH runner (different seed so any state the
    # restore failed to overwrite would diverge), run the remaining 2
    cfg3, tcfg3 = _cfgs()
    tcfg3 = tcfg3.replace(seed=123)
    env3 = XBotLEnv(cfg3)
    b = OnPolicyRunner(env3, tcfg3)
    carry = b.load_state(str(state_path), b.init_carry())
    assert b.iteration == 2
    b_carry = b.learn(2, carry=carry)

    for x, y in zip(_leaves(ref_carry.train_state.params),
                    _leaves(b_carry.train_state.params)):
        np.testing.assert_array_equal(x, y)
    # env-side state is also carried exactly
    np.testing.assert_array_equal(
        np.asarray(ref_carry.env_state.episode_length),
        np.asarray(b_carry.env_state.episode_length),
    )
    np.testing.assert_array_equal(
        np.asarray(ref_carry.key), np.asarray(b_carry.key)
    )


def test_npz_fallback_roundtrip(tmp_path, monkeypatch):
    """The no-orbax fallback (PARITY 'npz-pytree fallback') round-trips an
    arbitrary pytree exactly."""
    import jax.numpy as jnp

    from humanoid_tpu.utils import checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_have_orbax", lambda: False)
    payload = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": jnp.ones(3)},
        "iteration": jnp.asarray(7),
    }
    path = str(tmp_path / "model_7")
    ckpt.save_checkpoint(path, jax.device_get(payload))
    assert os.path.isfile(path + ".npz")
    restored = ckpt.load_checkpoint(path, payload)
    for x, y in zip(jax.tree.leaves(payload), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_plain_resume_still_works(tmp_path):
    cfg, tcfg = _cfgs()
    env = XBotLEnv(cfg)
    a = OnPolicyRunner(env, tcfg, log_dir=str(tmp_path / "run"))
    a.learn(2, init_at_random_ep_len=True)
    b = OnPolicyRunner(XBotLEnv(cfg), tcfg)
    b.load(str(tmp_path / "run" / "model_2"))
    assert b.iteration == 2
    for x, y in zip(_leaves(a.train_state.params),
                    _leaves(b.train_state.params)):
        np.testing.assert_array_equal(x, y)
