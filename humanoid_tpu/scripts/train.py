"""Training entry point (reference scripts/train.py).

  python -m humanoid_tpu.scripts.train --task humanoid_ppo \
      --num-envs 4096 --max-iterations 3001
"""
from __future__ import annotations

import argparse
import sys


def get_args(argv=None):
    """CLI surface mirroring the reference get_args (helpers.py:161-239),
    minus Isaac-specific device plumbing (JAX owns device selection)."""
    p = argparse.ArgumentParser(description="humanoid_tpu trainer")
    p.add_argument("--task", default="humanoid_ppo")
    p.add_argument("--num-envs", "--num_envs", dest="num_envs", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--max-iterations", "--max_iterations",
                   dest="max_iterations", type=int)
    p.add_argument("--experiment-name", "--experiment_name",
                   dest="experiment_name")
    p.add_argument("--run-name", "--run_name", dest="run_name")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load-run", "--load_run", dest="load_run", default="-1")
    p.add_argument("--checkpoint", type=int, default=-1)
    p.add_argument("--terrain", choices=["plane", "heightfield", "trimesh"])
    p.add_argument("--contact", choices=["penalty", "pgs"],
                   help="contact model override: the constraint-based "
                        "block-PGS solve (physics/pgs.py; the shipping "
                        "default on every registered task) or the "
                        "compliant penalty model (A/B)")
    p.add_argument("--log-root", dest="log_root")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an XLA device trace of N iterations "
                        "(view with tensorboard --logdir <run_dir>)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the env axis over all visible devices "
                        "(data-parallel rollout, psum'd gradients via "
                        "GSPMD; see parallel/mesh.py)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first so "
                        "jax.devices() spans all hosts (use with --mesh)")
    p.add_argument("--eval-gate", dest="eval_gate", nargs="?", const=60.0,
                   type=float, default=None, metavar="SECONDS",
                   help="run the MuJoCo sim2sim gate on every checkpoint "
                        "in an async CPU subprocess (BASELINE config 4); "
                        "optional arg = gate duration in sim seconds")
    p.add_argument("--full-state", dest="full_state", action="store_true",
                   help="checkpoint the FULL iteration carry (env/curricula/"
                        "RNG state) next to each model_<it> so --resume "
                        "continues the run bitwise-identically instead of "
                        "re-initializing envs (single-process only)")
    p.add_argument("--wandb", action="store_true",
                   help="mirror metrics to wandb (offline mode, syncing "
                        "tensorboard like the reference, "
                        "on_policy_runner.py:96-102); no-op if wandb is "
                        "not installed")
    return p.parse_args(argv)


def train(args) -> None:
    import os

    if getattr(args, "multihost", False):
        # multi-host DP: every host runs this same script;
        # jax.devices() then spans the full slice (SURVEY.md §5.8)
        import jax

        jax.distributed.initialize()

    from ..utils import registry
    from ..utils.checkpoint import get_load_path
    from ..utils.logging import TrainLogger

    env, env_cfg = registry.make_env(args.task, args)
    runner, train_cfg = registry.make_alg_runner(
        env, args.task, args, log_root=args.log_root
    )
    if getattr(args, "full_state", False):
        import dataclasses

        runner.cfg = runner.cfg.replace(
            runner=dataclasses.replace(runner.cfg.runner, save_env_state=True)
        )
    resume_carry = None
    if args.resume:
        root = os.path.join(
            args.log_root or registry.LOG_ROOT,
            train_cfg.runner.experiment_name,
        )
        path = get_load_path(root, args.load_run, args.checkpoint)
        state_path = os.path.join(
            os.path.dirname(path),
            os.path.basename(path).replace("model_", "state_"),
        )
        if os.path.isdir(state_path) or os.path.isfile(state_path + ".npz"):
            # exact-state resume: restore the full carry (env/curricula/
            # RNG) so the run continues where it stopped
            print(f"resuming exact state from {state_path}")
            resume_carry = runner.load_state(
                state_path, runner.init_carry(init_at_random_ep_len=True)
            )
        else:
            print(f"resuming from {path}")
            runner.load(path)

    # process 0 owns all side effects (logging, eval gate, console);
    # runner.save() is itself process-0-guarded (parallel/dist.py)
    from ..parallel.dist import is_main

    main = is_main()
    logger = TrainLogger(
        runner.log_dir, env.reward_names, env_cfg, train_cfg,
        use_wandb=getattr(args, "wandb", False),
    ) if main else None
    gate = None
    if getattr(args, "eval_gate", None) and runner.log_dir and main:
        from ..deploy.eval_gate import CheckpointEvalGate

        gate = CheckpointEvalGate(
            runner.log_dir, duration=args.eval_gate, task=args.task
        )
        runner.on_checkpoint = gate
    total = args.max_iterations or train_cfg.runner.max_iterations

    def log_fn(it, metrics, fps, dt):
        scalars = logger.log(it, metrics, fps, dt)
        if it % train_cfg.runner.log_interval == 0:
            print(logger.console(it, total, scalars), flush=True)

    if not main:
        log_fn = None
    if main:
        print(f"task={args.task} envs={env_cfg.env.num_envs} "
              f"iters={total} log_dir={runner.log_dir}")
    carry = resume_carry
    if getattr(args, "mesh", False):
        from ..parallel.mesh import make_mesh, shard_env_pytree

        mesh = make_mesh()
        if carry is None:
            carry = runner.init_carry(init_at_random_ep_len=True)
        carry = shard_env_pytree(carry, mesh, env_cfg.env.num_envs)
        if main:
            from ..parallel.dist import process_count

            print(f"env axis sharded over {mesh.devices.size} devices "
                  f"({process_count()} process(es))")
    try:
        if args.profile:
            # warm up (compile) outside the trace, then capture N iters
            from ..utils.profiling import device_trace

            carry = runner.learn(1, init_at_random_ep_len=True,
                                 log_fn=log_fn, carry=carry)
            with device_trace(runner.log_dir):
                carry = runner.learn(args.profile, log_fn=log_fn,
                                     carry=carry)
            print(f"trace written under {runner.log_dir}")
            runner.learn(max(0, total - 1 - args.profile), log_fn=log_fn,
                         carry=carry)
        else:
            runner.learn(total, init_at_random_ep_len=True, log_fn=log_fn,
                         carry=carry)
    finally:
        if gate is not None:
            gate.wait_all()
            n_pass = sum(1 for r in gate.results if r.get("passed"))
            print(f"[eval-gate] {n_pass}/{len(gate.results)} checkpoints "
                  f"passed ({runner.log_dir}/eval_gate.jsonl)")
        if logger is not None:
            logger.close()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    train(get_args())
