"""Benchmark: full training iteration throughput on the reference workload.

Metric (matches the reference's fps definition, on_policy_runner.py:204-208):
  env_steps_per_sec = num_steps_per_env * num_envs / iteration_wall_clock
measured on the SHIPPING flagship task (`humanoid_ppo` from the registry:
4096 envs, 60-step rollout, 10x 1 kHz physics substeps per control step,
block-PGS contact, full PPO update) — the configuration a default
`python -m humanoid_tpu.scripts.train` run uses and the one validated to
pass the 60 s reference-MJCF sim2sim gate (VALIDATION.md). Pass
`--task humanoid_ppo_penalty` for the compliant-contact A/B number.

Baseline: Isaac Gym humanoid-gym on one A100 is assumed at 50k env-steps/s
(the reference publishes no numbers — BASELINE.md; the driver target is
>=5x that on a v5e host). vs_baseline = value / 50_000.

Prints ONE JSON line.
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

A100_BASELINE = 50_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="humanoid_ppo")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    import jax

    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.utils import registry

    cfg, tcfg = registry.get_cfgs(args.task)
    cfg = cfg.replace(env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    tcfg = tcfg.replace(
        runner=dataclasses.replace(tcfg.runner, num_steps_per_env=args.steps)
    )
    env, _ = registry.make_env(args.task, env_cfg=cfg)
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
                "unit": (
                    f"env-steps/s ({args.task}: {args.num_envs} envs, "
                    f"{args.steps}-step PPO iteration, "
                    f"{cfg.sim.contact_model} contact, 1 chip)"
                ),
                "vs_baseline": round(fps / A100_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
