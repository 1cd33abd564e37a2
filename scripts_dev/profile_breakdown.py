"""Dev tool: per-phase timing of the training iteration on the real chip.

Times, separately jitted:
  1. rollout only (60x env.step + policy forward, no PPO)
  2. env.step only (no policy)
  3. PPO update only (on a fixed batch)
  4. full iteration (reference composition)

Contact model via HUMANOID_TPU_PROFILE_CONTACT=penalty|pgs (default pgs —
the shipping model); extra PGS solver knobs via
HUMANOID_TPU_PROFILE_PGS=<iters>[,freeze][,warm].
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.algo.networks import sample_action, log_prob
from humanoid_tpu.algo.ppo import Batch, ppo_update
from humanoid_tpu.config.structs import (
    EnvCfg, RunnerCfg, SimCfg, XBotLCfg, XBotLCfgPPO,
)
from humanoid_tpu.env import XBotLEnv

N = 4096
T = 60
_contact = os.environ.get("HUMANOID_TPU_PROFILE_CONTACT", "pgs")
_pgs_spec = os.environ.get("HUMANOID_TPU_PROFILE_PGS", "8").split(",")
sim = SimCfg(
    contact_model=_contact,
    pgs_iterations=int(_pgs_spec[0]),
    pgs_freeze_prep="freeze" in _pgs_spec,
    pgs_warm_start="warm" in _pgs_spec,
)
print(f"contact={_contact} pgs_iters={sim.pgs_iterations} "
      f"freeze_prep={sim.pgs_freeze_prep} warm={sim.pgs_warm_start}")
cfg = XBotLCfg(env=EnvCfg(num_envs=N), sim=sim)
tcfg = XBotLCfgPPO(runner=RunnerCfg(num_steps_per_env=T))
env = XBotLEnv(cfg)
runner = OnPolicyRunner(env, tcfg)
carry = runner.init_carry()
net = runner.net


def bench(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.2f} ms  ({T*N/min(ts)/1e6:.2f} M env-steps/s)")
    return out


@jax.jit
def env_only(state, key):
    def step(c, _):
        s, k = c
        ka, ke, k = jax.random.split(k, 3)
        a = jax.random.normal(ka, (N, cfg.env.num_actions))
        s, out = env.step(s, a, ke)
        return (s, k), out.rew

    (state, key), rews = jax.lax.scan(step, (state, key), None, length=T)
    return rews.sum()


@jax.jit
def rollout_only(ts_params, state, obs, cobs, key):
    def step(c, _):
        s, o, co, k = c
        ka, ke, k = jax.random.split(k, 3)
        mean, std, value, _ = net.apply(ts_params, o, co)
        a = sample_action(ka, mean, std)
        s, out = env.step(s, a, ke)
        return (s, out.obs, out.privileged_obs, k), out.rew

    (state, obs, cobs, key), rews = jax.lax.scan(
        step, (state, obs, cobs, key), None, length=T)
    return rews.sum()


@jax.jit
def full_iter(c):
    c2, m = runner._train_iteration(c)
    return c2


# fixed batch for update-only timing
store_dt = jnp.dtype(tcfg.policy.compute_dtype)
B = T * N
k = jax.random.PRNGKey(0)
batch = Batch(
    obs=jnp.zeros((B, cfg.env.num_observations), store_dt),
    critic_obs=jnp.zeros((B, cfg.env.num_privileged_obs), store_dt),
    actions=jnp.zeros((B, cfg.env.num_actions)),
    old_logp=jnp.zeros((B,)),
    old_mu=jnp.zeros((B, cfg.env.num_actions)),
    old_sigma=jnp.ones((B, cfg.env.num_actions)),
    target_values=jnp.zeros((B,)),
    advantages=jnp.zeros((B,)),
    returns=jnp.zeros((B,)),
)


@jax.jit
def update_only(ts):
    ts2, m = ppo_update(net, tcfg.algorithm, ts, batch, k, runner.vel_slice)
    return ts2.params


bench("env.step only x60", env_only, carry.env_state, carry.key)
bench("rollout (env+policy) x60", rollout_only, carry.train_state.params,
      carry.env_state, carry.obs, carry.critic_obs, carry.key)
bench("ppo update only", update_only, carry.train_state)
bench("full iteration", full_iter, carry)
