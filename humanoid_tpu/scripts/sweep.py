"""Parallel config sweep across hosts (BASELINE.json config 5).

Runs a grid of training configs — command ranges, reward-curriculum
ratios, seeds — partitioned across the hosts of a multi-host slice:
host i (jax.process_index) trains sweep points i, i+H, i+2H, ... on its
local chips, so a 4-host pod sweeps 4 configs at a time with zero
cross-host traffic (each point is an independent data-parallel run over
that host's devices). On a single host the same script just runs the
points sequentially.

Each point writes a normal run dir (checkpoints/metrics.jsonl) plus one
summary line in <log-root>/sweep_results.jsonl: final mean reward,
episode length, fps, and the optional sim2sim gate verdict.

Sweep spec: a JSON file (or inline JSON) mapping flat config paths to
lists of values, e.g.

    {"rewards.course_ratio": [1.0, 1.001],
     "commands.ranges.lin_vel_x": [[-0.3, 0.6], [-0.5, 1.0]],
     "seed": [1, 2]}

The cross-product defines the grid (8 points above).

Usage:
  python -m humanoid_tpu.scripts.sweep --task humanoid_ppo \
      --spec sweep.json --max-iterations 500 --num-envs 8192 \
      [--multihost] [--eval-gate 10]
"""
from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="humanoid_tpu sweep")
    p.add_argument("--task", default="humanoid_ppo")
    p.add_argument("--spec", required=True,
                   help="JSON file path or inline JSON: "
                        "{cfg.path: [values...]}")
    p.add_argument("--num-envs", dest="num_envs", type=int)
    p.add_argument("--max-iterations", dest="max_iterations", type=int,
                   default=500)
    p.add_argument("--log-root", dest="log_root", default=None)
    p.add_argument("--eval-gate", dest="eval_gate", nargs="?", const=10.0,
                   type=float, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize(); hosts partition "
                        "the sweep grid by process_index")
    return p.parse_args(argv)


def _expand_grid(spec: dict):
    keys = list(spec)
    for combo in itertools.product(*(spec[k] for k in keys)):
        yield dict(zip(keys, combo))


def _set_path(cfg, path: str, value):
    """Immutable nested dataclasses.replace along a dotted path."""
    head, _, rest = path.partition(".")
    if not rest:
        return dataclasses.replace(cfg, **{head: _coerce(cfg, head, value)})
    sub = getattr(cfg, head)
    return dataclasses.replace(cfg, **{head: _set_path(sub, rest, value)})


def _coerce(cfg, field: str, value):
    cur = getattr(cfg, field)
    if isinstance(cur, tuple) and isinstance(value, list):
        return tuple(value)
    return value


def apply_point(env_cfg, train_cfg, point: dict):
    for path, value in point.items():
        root = path.partition(".")[0]
        hit = False
        # apply to every cfg that has the field: `seed` exists on both and
        # must match (the runner PRNG seeds from train_cfg, the env from
        # env_cfg)
        if hasattr(env_cfg, root):
            env_cfg = _set_path(env_cfg, path, value)
            hit = True
        if hasattr(train_cfg, root):
            train_cfg = _set_path(train_cfg, path, value)
            hit = True
        if not hit:
            raise KeyError(f"sweep path {path!r} not in env or train cfg")
    return env_cfg, train_cfg


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.multihost:
        jax.distributed.initialize()
        pid, nhosts = jax.process_index(), jax.process_count()
    else:
        pid, nhosts = 0, 1

    from ..utils import registry
    from ..utils.logging import TrainLogger

    spec = (json.load(open(args.spec)) if os.path.exists(args.spec)
            else json.loads(args.spec))
    grid = list(_expand_grid(spec))
    mine = grid[pid::nhosts]
    log_root = args.log_root or registry.LOG_ROOT
    os.makedirs(log_root, exist_ok=True)
    results_path = os.path.join(log_root, "sweep_results.jsonl")
    print(f"host {pid}/{nhosts}: {len(mine)}/{len(grid)} sweep points")

    for idx, point in enumerate(mine):
        base_env_cfg, base_train_cfg = registry.get_cfgs(args.task)
        env_cfg, train_cfg = apply_point(base_env_cfg, base_train_cfg, point)
        if args.num_envs:
            env_cfg = _set_path(env_cfg, "env.num_envs", args.num_envs)
        run_name = f"sweep{pid}_{idx}"
        train_cfg = _set_path(train_cfg, "runner.run_name", run_name)
        env, env_cfg = registry.make_env(args.task, env_cfg=env_cfg)
        runner, train_cfg = registry.make_alg_runner(
            env, args.task, None, log_root=log_root, train_cfg=train_cfg
        )
        gate = None
        if args.eval_gate:
            from ..deploy.eval_gate import CheckpointEvalGate

            gate = CheckpointEvalGate(runner.log_dir,
                                      duration=args.eval_gate)
            runner.on_checkpoint = gate
        logger = TrainLogger(runner.log_dir, env.reward_names, env_cfg,
                             train_cfg)
        last = {}

        def log_fn(it, metrics, fps, dt):
            nonlocal last
            last = logger.log(it, metrics, fps, dt)

        t0 = time.time()
        runner.learn(args.max_iterations, log_fn=log_fn)
        if gate is not None:
            gate.wait_all()
        logger.close()
        # always export the point's final actor for downstream judges
        # (e.g. targeted gate-matrix cells over the sweep grid)
        from ..deploy.export import export_policy_npz

        final_npz = os.path.join(runner.log_dir, "policy_final.npz")
        export_policy_npz(runner.train_state.params, final_npz)
        rec = {
            "host": pid, "point": point, "run_dir": runner.log_dir,
            "policy": final_npz,
            "iterations": args.max_iterations,
            "wall_s": round(time.time() - t0, 1),
            "mean_reward": last.get("Train/mean_reward"),
            "mean_episode_length": last.get("Train/mean_episode_length"),
            "fps": last.get("Perf/total_fps"),
            "gate_passed": (None if gate is None else
                            all(r.get("passed", False) for r in gate.results
                                if not r.get("skipped"))),
        }
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[sweep] done {point} -> reward "
              f"{rec['mean_reward']}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
