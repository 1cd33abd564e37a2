"""One process of an N-process CPU trainer (driven by test_multiprocess.py).

Each process owns 2 virtual CPU devices; jax.distributed.initialize glues
them into one global mesh (Gloo collectives). The worker runs two sharded
train iterations, exercises the multi-host conventions (sync_run_name,
process-0-guarded checkpointing), and dumps its view of the results for
the parent test to cross-check.

Usage: _mp_worker.py <process_id> <num_processes> <port> <outdir>
"""
import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import numpy as np

    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.config.structs import (
        AlgorithmCfg,
        EnvCfg,
        RunnerCfg,
        XBotLCfg,
        XBotLCfgPPO,
    )
    from humanoid_tpu.env import XBotLEnv
    from humanoid_tpu.parallel.dist import is_main, sync_run_name
    from humanoid_tpu.parallel.mesh import make_mesh, shard_env_pytree

    assert len(jax.devices()) == 2 * nproc, jax.devices()

    env = XBotLEnv(XBotLCfg(env=EnvCfg(num_envs=8)))
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(num_steps_per_env=2),
        algorithm=AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1),
    )
    runner = OnPolicyRunner(env, tcfg, log_dir=os.path.join(outdir, "run"))
    mesh = make_mesh()
    carry = runner.init_carry()
    carry = shard_env_pytree(carry, mesh, 8)
    # Compile BEFORE the processes synchronize: XLA compilation is
    # process-local and (on CPU, minutes for the physics graph) staggers
    # the processes far beyond Gloo's 30 s context-init window. AOT
    # compile, meet at a KV-store barrier (no collectives), then execute —
    # the first collective then fires near-simultaneously everywhere.
    compiled = runner._train_iter.lower(carry).compile()
    jax._src.distributed.global_state.client.wait_at_barrier(
        "compiled", 1800 * 1000
    )
    for _ in range(2):
        carry, metrics = compiled(carry)
    jax.block_until_ready(carry.train_state.params)
    runner.train_state = carry.train_state
    runner.iteration = 2

    # every process calls save(); only process 0 must write
    ckpt_path = runner.save()

    # per-process name goes in, process 0's must come out everywhere
    name = sync_run_name(f"proc{pid}-name")

    params = jax.device_get(carry.train_state.params)
    out = {
        "pid": pid,
        "is_main": bool(is_main()),
        "name": name,
        "mean_step_reward": float(jax.device_get(metrics.mean_step_reward)),
        "value_loss": float(jax.device_get(metrics.update.value_loss)),
        "param_sums": [
            float(np.sum(np.asarray(leaf, dtype=np.float64)))
            for leaf in jax.tree.leaves(params)
        ],
        "ckpt_path": ckpt_path,
    }
    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
