"""Dev tool: decompose the PPO update's 56 ms (VERDICT r4 next #3 — the
update now rivals the whole 600-substep physics scan).

Times, separately jitted, on the real chip (4096 envs x 60 steps,
B = 245,760, 2 epochs x 4 minibatches of 61,440):

  1. full ppo_update (the measured 56 ms)
  2. the minibatch materialization alone (granule-tile gather + reshape)
  3. one grad step alone (loss fwd+bwd + adam), x8 = the serial floor
  4. loss forward alone / grad alone (no optimizer)
  5. granule variants (8 / 32 / 256) for the gather layout
  6. dtype of the stored batch (bf16 vs f32 obs stack)

Usage (chip must be idle):  python scripts_dev/profile_update.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp

from humanoid_tpu.algo.networks import ActorCritic, init_params
from humanoid_tpu.algo.ppo import (
    Batch,
    init_train_state,
    make_optimizer,
    ppo_update,
)
from humanoid_tpu.config.structs import XBotLCfg, XBotLCfgPPO

N, T = 4096, 60
B = N * T
cfg = XBotLCfg()
tcfg = XBotLCfgPPO()
acfg = tcfg.algorithm
K = cfg.env.num_observations           # 705
KP = cfg.env.num_privileged_obs        # 219
NJ = cfg.env.num_actions

net = ActorCritic(
    num_actions=NJ,
    actor_hidden_dims=tcfg.policy.actor_hidden_dims,
    critic_hidden_dims=tcfg.policy.critic_hidden_dims,
    vel_est_hidden_dims=tcfg.policy.vel_est_hidden_dims,
    init_noise_std=tcfg.policy.init_noise_std,
    compute_dtype=tcfg.policy.compute_dtype,
)
params = init_params(jax.random.PRNGKey(0), net, K, KP)
ts = init_train_state(params, acfg)
VEL = (53, 56)


def make_batch(dt):
    k = jax.random.PRNGKey(1)
    return Batch(
        obs=jax.random.normal(k, (B, K), dt),
        critic_obs=jax.random.normal(k, (B, KP), dt),
        actions=jax.random.normal(k, (B, NJ)),
        old_logp=jnp.zeros((B,)),
        old_mu=jnp.zeros((B, NJ)),
        old_sigma=jnp.ones((B, NJ)),
        target_values=jnp.zeros((B,)),
        advantages=jnp.ones((B,)),
        returns=jnp.zeros((B,)),
    )


def bench(name, fn, *args, reps=8):
    out = jax.block_until_ready(fn(*args))
    ts_ = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts_.append(time.time() - t0)
    ms = min(ts_) * 1e3
    eff = B / min(ts_) / 1e6
    print(f"{name:52s} {ms:8.2f} ms  ({eff:7.2f} M env-steps/s if it were "
          "the whole iteration)")
    return out


batch = make_batch(jnp.bfloat16)
key = jax.random.PRNGKey(2)

# 1. full update
f_update = jax.jit(
    lambda ts_, b: ppo_update(net, acfg, ts_, b, key, VEL)[0].params
)
bench("full ppo_update (2 epochs x 4 mb, granule 8)", f_update, ts, batch)

# granule variants
for g in (1, 32, 256):
    ag = dataclasses.replace(acfg, shuffle_granule=g)
    fg = jax.jit(
        lambda ts_, b, _ag=ag: ppo_update(net, _ag, ts_, b, key, VEL)[0].params
    )
    bench(f"full ppo_update (granule {g})", fg, ts, batch)

# 2. materialization alone (granule 8)
g = acfg.shuffle_granule
mb_size = B // acfg.num_mini_batches


@jax.jit
def materialize(b):
    perm = jax.random.permutation(key, B // g)

    def take(x):
        tiles = x.reshape((B // g, g) + x.shape[1:])[perm]
        return tiles.reshape((acfg.num_mini_batches, mb_size) + x.shape[1:])

    return jax.tree.map(take, b)


mbs = bench("materialize minibatches alone (granule 8)", materialize, batch)
mb0 = jax.tree.map(lambda x: x[0], mbs)

# 3. one grad step (loss fwd+bwd + adam) x1
tx = make_optimizer(acfg)
opt_state = tx.init(params)


def loss_fn(p, mb):
    from humanoid_tpu.algo.networks import entropy as entropy_fn
    from humanoid_tpu.algo.networks import log_prob

    mean, std, value, vel = net.apply(p, mb.obs, mb.critic_obs)
    logp = log_prob(mean, std, mb.actions)
    ratio = jnp.exp(logp - mb.old_logp)
    surr = jnp.mean(jnp.maximum(-mb.advantages * ratio,
                                -mb.advantages * jnp.clip(ratio, 0.8, 1.2)))
    v_l = jnp.mean(jnp.square(value - mb.returns))
    vel_l = jnp.mean(jnp.square(vel - mb.critic_obs[:, VEL[0]:VEL[1]]))
    return surr + v_l + 0.5 * vel_l - 1e-3 * jnp.mean(entropy_fn(std))


@jax.jit
def one_grad_step(p, o, mb):
    grads = jax.grad(loss_fn)(p, mb)
    updates, o2 = tx.update(grads, o, p)
    import optax

    return optax.apply_updates(
        p, jax.tree.map(lambda u: -1e-5 * u, updates)), o2


bench("one grad step (61,440 rows; x8 = serial floor)", one_grad_step,
      params, opt_state, mb0)

# 4. loss forward alone / grad alone
bench("loss forward alone", jax.jit(loss_fn), params, mb0)
bench("grad alone (no optimizer)",
      jax.jit(lambda p, mb: jax.grad(loss_fn)(p, mb)), params, mb0)

# 5. actor fwd alone on the full 61,440 x 705 stack
bench("actor+critic+vel fwd alone",
      jax.jit(lambda p, mb: net.apply(p, mb.obs, mb.critic_obs)), params,
      mb0)

# 6. f32 batch variant of the full update
batch32 = make_batch(jnp.float32)
bench("full ppo_update (f32 obs stack)", f_update, ts, batch32)
