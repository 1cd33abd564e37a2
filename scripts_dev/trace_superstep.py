"""Dev tool: trace the production K=10 superstep and print device busy/idle
plus the op-type breakdown per iteration."""
import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.config.structs import EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO
from humanoid_tpu.env import XBotLEnv

N, T, K = 4096, 60, 10
cfg = XBotLCfg(env=EnvCfg(num_envs=N))
tcfg = XBotLCfgPPO(runner=RunnerCfg(num_steps_per_env=T))
env = XBotLEnv(cfg)
runner = OnPolicyRunner(env, tcfg)
carry = runner.init_carry()
step = runner._train_superstep(K)

carry, _ = step(carry)
jax.block_until_ready(carry.train_state.params)

logdir = "/tmp/trace_superstep"
with jax.profiler.trace(logdir):
    carry, _ = step(carry)
    jax.block_until_ready(carry.train_state.params)

paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
from xprof.convert import raw_to_tool_data as r

data, _ = r.xspace_to_tool_data(paths, "framework_op_stats", {})
d = json.loads(data)
tbl = next(t for t in d if t.get("rows"))
cols = [c["id"] for c in tbl["cols"]]
i_dev = cols.index("host_or_device"); i_op = cols.index("operation")
i_type = cols.index("type"); i_self = cols.index("total_self_time")
import collections
typagg = collections.Counter(); idle = 0.0
for row in tbl["rows"]:
    c = [v["v"] if isinstance(v, dict) else v for v in row["c"]]
    if c[i_dev] != "Device":
        continue
    if c[i_type] == "IDLE":
        idle += c[i_self]
        continue
    typagg[c[i_type]] += c[i_self]
busy = sum(typagg.values())
print(f"device busy {busy/1e3/K:.2f} ms/iter, idle-in-capture {idle/1e3:.1f} ms")
for t, tv in typagg.most_common(18):
    print(f"  {tv/1e3/K:7.2f} ms/iter  {t}")
