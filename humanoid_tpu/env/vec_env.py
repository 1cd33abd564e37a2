"""Stateful VecEnv facade over the functional env.

The reference defines the env<->algo contract as an abstract torch class
(algo/vec_env.py:39-63): attributes num_envs/num_obs/num_privileged_obs/
num_actions/max_episode_length plus `step(actions) -> (obs, priv_obs, rew,
reset, extras)`, `reset()`, `get_observations()`. Our native trainer
consumes the pure `XBotLEnv.step` directly (whole iterations live inside
one jit), but users porting rsl_rl-style code get the same stateful
surface here: the adapter owns the EnvState + PRNG key and mirrors the
reference's auto-reset/extras semantics (humanoid_env.py:1141-1152).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .xbotl import EnvState, StepOutput, XBotLEnv


class VecEnvAdapter:
    def __init__(self, env: XBotLEnv, seed: int = 0):
        self.env = env
        cfg = env.cfg
        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.max_episode_length = env.max_episode_length
        self.extras: Dict = {}
        self._key = jax.random.PRNGKey(seed)
        self._step = jax.jit(env.step)
        self._state: Optional[EnvState] = None
        self.obs_buf = None
        self.privileged_obs_buf = None
        self.rew_buf = None
        self.reset_buf = None

    @property
    def episode_length_buf(self):
        return self._state.episode_length

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def reset(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fresh state + one zero-action step, like BaseTask.reset
        (base_task.py:144-149)."""
        self._state = self.env.initial_state(self._next_key())
        obs, priv, *_ = self.step(
            jnp.zeros((self.num_envs, self.num_actions))
        )
        return obs, priv

    def step(self, actions):
        if self._state is None:
            self._state = self.env.initial_state(self._next_key())
        self._state, out = self._step(
            self._state, jnp.asarray(actions), self._next_key()
        )
        self.obs_buf = out.obs
        self.privileged_obs_buf = out.privileged_obs
        self.rew_buf = out.rew
        self.reset_buf = out.reset
        # per-term episode means over just-finished episodes + timeout split
        # (humanoid_env.py:1141-1152)
        n = jnp.maximum(out.ep_count, 1.0)
        self.extras = {
            "episode": {
                f"rew_{name}": out.ep_rew_sums[i] / n
                for i, name in enumerate(self.env.reward_names)
            },
            "time_outs": out.time_outs,
        }
        return out.obs, out.privileged_obs, out.rew, out.reset, self.extras

    def get_observations(self):
        return self.obs_buf

    def get_privileged_observations(self):
        return self.privileged_obs_buf
