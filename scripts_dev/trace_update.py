"""Dev tool: capture an XLA device trace of the PPO update (and optionally
the rollout) and print the top HLO ops by self time, using xprof's offline
converters — no tensorboard UI needed.
"""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.algo.ppo import Batch, ppo_update
from humanoid_tpu.config.structs import EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO
from humanoid_tpu.env import XBotLEnv

N, T = 4096, 60
cfg = XBotLCfg(env=EnvCfg(num_envs=N))
tcfg = XBotLCfgPPO(runner=RunnerCfg(num_steps_per_env=T))
env = XBotLEnv(cfg)
runner = OnPolicyRunner(env, tcfg)
carry = runner.init_carry()
net = runner.net

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


@jax.jit
def full_iter(c):
    c2, m = runner._train_iteration(c)
    return c2


# warm up
jax.block_until_ready(update_only(carry.train_state))
jax.block_until_ready(full_iter(carry))

logdir = "/tmp/trace_update"
with jax.profiler.trace(logdir):
    for _ in range(3):
        jax.block_until_ready(update_only(carry.train_state))
    for _ in range(2):
        carry = full_iter(carry)
        jax.block_until_ready(carry.env_state.base_pos
                              if hasattr(carry.env_state, "base_pos")
                              else carry.obs)

time.sleep(1)
paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
print("xplane files:", paths)
if not paths:
    sys.exit("no trace captured")

from xprof.convert import raw_to_tool_data as r

names = r.xspace_to_tool_names(paths)
print("tools:", names)

for tool in ("hlo_op_stats", "framework_op_stats", "op_profile"):
    if tool not in " ".join(names):
        continue
    try:
        data, ctype = r.xspace_to_tool_data(paths, tool, {})
    except Exception as e:
        print(f"{tool}: failed: {e}")
        continue
    out = f"/tmp/trace_update/{tool}.out"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print(f"{tool}: wrote {out} ({len(data)} bytes, {ctype})")
