"""Benchmark: full training iteration throughput on the reference workload.

Metric (matches the reference's fps definition, on_policy_runner.py:204-208):
  env_steps_per_sec = num_steps_per_env * num_envs / iteration_wall_clock
measured on the flagship config (4096 envs, 60-step rollout, 10x 1 kHz
physics substeps per control step, full PPO update).

Baseline: Isaac Gym humanoid-gym on one A100 is assumed at 50k env-steps/s
(the reference publishes no numbers — BASELINE.md; the driver target is
>=5x that on a v5e host). vs_baseline = value / 50_000.

Prints ONE JSON line.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

A100_BASELINE = 50_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    import jax

    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.config.structs import EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO

    cfg = XBotLCfg(env=EnvCfg(num_envs=args.num_envs))
    tcfg = XBotLCfgPPO(runner=RunnerCfg(num_steps_per_env=args.steps))
    env = XBotLEnv_build(cfg)
    runner = OnPolicyRunner(env, tcfg)
    carry = runner.init_carry()

    # measure the production dispatch path: K iterations per jitted call
    # (runner.learn superstep; amortizes host dispatch latency)
    K = tcfg.runner.iters_per_dispatch
    step = runner._train_superstep(K)

    for _ in range(args.warmup):
        carry, _ = step(carry)
        jax.block_until_ready(carry.train_state.params)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        carry, metrics = step(carry)
        jax.block_until_ready(carry.train_state.params)
        times.append(time.time() - t0)

    best = min(times) / K
    fps = args.steps * args.num_envs / best
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(fps, 1),
                "unit": "env-steps/s (4096 envs, 60-step PPO iteration, 1 chip)",
                "vs_baseline": round(fps / A100_BASELINE, 3),
            }
        )
    )


def XBotLEnv_build(cfg):
    from humanoid_tpu.env import XBotLEnv

    return XBotLEnv(cfg)


if __name__ == "__main__":
    main()
