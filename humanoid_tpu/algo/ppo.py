"""Clipped-surrogate PPO update with adaptive-KL learning rate, clipped value
loss, entropy bonus, auxiliary velocity-estimator loss, and optional mirror
-symmetry loss.

Functional rebuild of the reference PPO.update (/root/reference/humanoid/
algo/ppo/ppo.py:140-226): the epoch x minibatch loop is a lax.scan whose
carry is (params, adam state, lr); the KL-adaptive LR (x/÷1.5 within
[1e-5, 1e-2], ppo.py:167-174) is updated from each minibatch's forward pass
*before* its gradient is applied, exactly like the reference's in-loop
optimizer mutation. One random permutation is drawn and reused across epochs
(rollout_storage.py:157).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.structs import AlgorithmCfg
from .networks import entropy as entropy_fn
from .networks import kl_divergence, log_prob


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    lr: jnp.ndarray          # () adaptive learning rate


class Batch(NamedTuple):
    """Flattened (B, ·) rollout data (B = T*N)."""
    obs: jnp.ndarray
    critic_obs: jnp.ndarray
    actions: jnp.ndarray
    old_logp: jnp.ndarray
    old_mu: jnp.ndarray
    old_sigma: jnp.ndarray
    target_values: jnp.ndarray
    advantages: jnp.ndarray
    returns: jnp.ndarray


class UpdateMetrics(NamedTuple):
    value_loss: jnp.ndarray
    surrogate_loss: jnp.ndarray
    vel_loss: jnp.ndarray
    sym_loss: jnp.ndarray
    kl: jnp.ndarray
    lr: jnp.ndarray


def make_optimizer(cfg: AlgorithmCfg):
    """Adam with external LR scaling (the adaptive LR lives in TrainState)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.scale_by_adam(),
    )


def init_train_state(params, cfg: AlgorithmCfg) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        lr=jnp.asarray(cfg.learning_rate, dtype=jnp.float32),
    )


def ppo_update(
    net,
    cfg: AlgorithmCfg,
    ts: TrainState,
    batch: Batch,
    key,
    vel_target_slice: Tuple[int, int],
    obs_perm: Optional[jnp.ndarray] = None,
    act_perm: Optional[jnp.ndarray] = None,
) -> Tuple[TrainState, UpdateMetrics]:
    """Run num_learning_epochs x num_mini_batches gradient steps."""
    tx = make_optimizer(cfg)
    B = batch.obs.shape[0]
    mb_size = B // cfg.num_mini_batches
    # materialized uniform shuffle (reference rollout_storage.py:157),
    # permuted in tiles of `shuffle_granule` consecutive rows: a per-row
    # gather of the (T*N, obs) batch is random-access HBM and was the
    # hottest op of the whole iteration (~21 ms); tile gathers move
    # contiguous chunks at streaming bandwidth (see AlgorithmCfg).
    g = cfg.shuffle_granule
    if g <= 1 or B % g or mb_size % g:
        perm = jax.random.permutation(key, B)

        def take(x):
            return x[perm][: mb_size * cfg.num_mini_batches].reshape(
                (cfg.num_mini_batches, mb_size) + x.shape[1:]
            )
    else:
        perm = jax.random.permutation(key, B // g)

        def take(x):
            tiles = x.reshape((B // g, g) + x.shape[1:])[perm]
            return tiles.reshape(
                (cfg.num_mini_batches, mb_size) + x.shape[1:]
            )

    mbs = jax.tree.map(take, batch)
    vlo, vhi = vel_target_slice

    def loss_fn(params, mb: Batch):
        # (a hand-fused actor+vel first layer was tried here and measured
        # 1.3 ms/iter SLOWER than letting XLA schedule the two dots —
        # see validation/update_profile_r5)
        mean, std, value, vel = net.apply(params, mb.obs, mb.critic_obs)
        logp = log_prob(mean, std, mb.actions)
        ent = entropy_fn(std)
        kl = jax.lax.stop_gradient(
            jnp.mean(kl_divergence(mb.old_mu, mb.old_sigma, mean, std))
        )

        ratio = jnp.exp(logp - mb.old_logp)
        surrogate = -mb.advantages * ratio
        surrogate_clipped = -mb.advantages * jnp.clip(
            ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param
        )
        surrogate_loss = jnp.mean(jnp.maximum(surrogate, surrogate_clipped))

        if cfg.use_clipped_value_loss:
            value_clipped = mb.target_values + jnp.clip(
                value - mb.target_values, -cfg.clip_param, cfg.clip_param
            )
            value_loss = jnp.mean(
                jnp.maximum(
                    jnp.square(value - mb.returns),
                    jnp.square(value_clipped - mb.returns),
                )
            )
        else:
            value_loss = jnp.mean(jnp.square(mb.returns - value))

        vel_target = mb.critic_obs[:, vlo:vhi]
        vel_loss = jnp.mean(jnp.square(vel - vel_target))

        if cfg.sym_loss and obs_perm is not None:
            mirror_obs = mb.obs @ obs_perm
            mirror_act = net.apply(params, mirror_obs, method="act_mean")
            m_mirror_act = mirror_act @ act_perm
            sym_loss = jnp.mean(jnp.square(mean - m_mirror_act))
        else:
            sym_loss = jnp.zeros(())

        loss = (
            surrogate_loss
            + cfg.value_loss_coef * value_loss
            - cfg.entropy_coef * jnp.mean(ent)
            + cfg.sym_coef * sym_loss
            + cfg.base_lin_vel_coef * vel_loss
        )
        return loss, (value_loss, surrogate_loss, vel_loss, sym_loss, kl)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def minibatch_step(carry, mb):
        params, opt_state, lr = carry
        grads, (v_l, s_l, vel_l, sym_l, kl) = grad_fn(params, mb)
        # adaptive-KL LR, applied to THIS minibatch's step (ppo.py:162-174)
        if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
            lr = jnp.where(
                kl > cfg.desired_kl * 2.0,
                jnp.maximum(cfg.min_lr, lr / 1.5),
                jnp.where(
                    (kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                    jnp.minimum(cfg.max_lr, lr * 1.5),
                    lr,
                ),
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, lr), (v_l, s_l, vel_l, sym_l, kl)

    def epoch_step(carry, _):
        return jax.lax.scan(minibatch_step, carry, mbs)

    (params, opt_state, lr), metrics = jax.lax.scan(
        epoch_step, (ts.params, ts.opt_state, ts.lr), None,
        length=cfg.num_learning_epochs,
    )
    v_l, s_l, vel_l, sym_l, kl = jax.tree.map(jnp.mean, metrics)
    return (
        TrainState(params=params, opt_state=opt_state, lr=lr),
        UpdateMetrics(
            value_loss=v_l, surrogate_loss=s_l, vel_loss=vel_l,
            sym_loss=sym_l, kl=kl, lr=lr,
        ),
    )
