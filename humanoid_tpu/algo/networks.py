"""Actor-critic + auxiliary velocity-estimator networks.

Mirrors the reference ActorCritic (/root/reference/humanoid/algo/ppo/
actor_critic.py:36-149): ELU MLPs — actor obs->512->256->128->nj, critic
priv_obs->768->256->128->1, vel head obs->128->128->3 — with a learned,
state-independent action std (a raw parameter, like the reference's
nn.Parameter, not log-std; clamped at a small floor for safety).

Kept as flax.linen modules; parameters are plain pytrees that the PPO
update, checkpointing, and export all consume directly. MLP widths are
MXU-friendly multiples of 128 where the reference chose them (512/256/128).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

MIN_STD = 1e-3


class MLP(nn.Module):
    dims: Sequence[int]
    out_dim: int
    # computation dtype: bf16 hits the MXU at 2x fp32 throughput; params
    # stay fp32 (flax casts per-matmul) and bf16 dots accumulate fp32 on
    # TPU, so only activations round. Output is cast back to fp32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for d in self.dims:
            x = nn.elu(nn.Dense(d, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x).astype(
            jnp.float32
        )


class ActorCritic(nn.Module):
    num_actions: int
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (768, 256, 128)
    vel_est_hidden_dims: Sequence[int] = (128, 128)
    init_noise_std: float = 1.0
    compute_dtype: str = "float32"

    def setup(self):
        dt = jnp.dtype(self.compute_dtype)
        self.actor = MLP(self.actor_hidden_dims, self.num_actions, dtype=dt)
        self.critic = MLP(self.critic_hidden_dims, 1, dtype=dt)
        self.vel_est = MLP(self.vel_est_hidden_dims, 3, dtype=dt)
        self.std = self.param(
            "std",
            lambda key, shape: jnp.full(shape, self.init_noise_std),
            (self.num_actions,),
        )

    def __call__(self, obs, critic_obs):
        """Full forward (used for init): returns (mean, std, value, vel)."""
        return (
            self.actor(obs),
            self.action_std(),
            self.critic(critic_obs)[..., 0],
            self.vel_est(obs),
        )

    def action_std(self):
        return jnp.maximum(self.std, MIN_STD)

    def act_mean(self, obs):
        return self.actor(obs)

    def value(self, critic_obs):
        return self.critic(critic_obs)[..., 0]

    def estimate_vel(self, obs):
        return self.vel_est(obs)


def init_params(key, net: ActorCritic, num_obs: int, num_priv_obs: int):
    obs = jnp.zeros((1, num_obs))
    priv = jnp.zeros((1, num_priv_obs))
    return net.init(key, obs, priv)


# ---------------------------------------------------------------------------
# diagonal Gaussian helpers (reference uses torch.distributions.Normal)
# ---------------------------------------------------------------------------

def sample_action(key, mean, std):
    return mean + std * jax.random.normal(key, mean.shape)


def log_prob(mean, std, action):
    z = (action - mean) / std
    return jnp.sum(
        -0.5 * z * z - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    )


def entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), axis=-1)


def kl_divergence(old_mean, old_std, mean, std):
    """Reference's KL expression (ppo.py:162-166), summed over action dim."""
    return jnp.sum(
        jnp.log(std / old_std + 1e-5)
        + (jnp.square(old_std) + jnp.square(old_mean - mean))
        / (2.0 * jnp.square(std))
        - 0.5,
        axis=-1,
    )
