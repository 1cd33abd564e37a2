"""Generalized advantage estimation as a reverse lax.scan.

Reproduces RolloutStorage.compute_returns (/root/reference/humanoid/algo/
ppo/rollout_storage.py:122-143): delta = r + gamma*V'(1-done) - V,
A = delta + gamma*lam*(1-done)*A, returns = A + V. Advantage normalization
(line 143) is left to the caller so it can be a global reduction under
sharding (SURVEY.md §5.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(rewards, values, dones, last_values, gamma, lam):
    """rewards/values/dones: (T, N); last_values: (N,).

    Returns (advantages (T,N), returns (T,N))."""
    not_done = 1.0 - dones.astype(rewards.dtype)

    def body(carry, xs):
        adv_next, v_next = carry
        r, v, nd = xs
        delta = r + gamma * v_next * nd - v
        adv = delta + gamma * lam * nd * adv_next
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_values), last_values),
        (rewards, values, not_done),
        reverse=True,
    )
    return advantages, advantages + values
