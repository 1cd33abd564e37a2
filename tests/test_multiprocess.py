"""True multi-PROCESS training test (VERDICT r1 next #1).

Round 1 validated multi-chip sharding only inside one process (virtual
devices). This launches 2 real processes — each with 2 virtual CPU
devices, glued by jax.distributed + Gloo collectives into one 4-device
global mesh — runs two sharded train iterations, and asserts:

  * both processes compute the identical global result (replicated
    params agree bit-for-bit across processes);
  * the result matches a single-process run over 4 devices (same seed);
  * sync_run_name resolves every process to process 0's run name;
  * only process 0 writes the checkpoint, and it is complete/loadable.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns real 2-process Gloo training runs: ~2 min

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "PALLAS_AXON_POOL_IPS": "",   # skip the axon TPU-tunnel backend
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    outs = {}
    for i in range(2):
        with open(os.path.join(outdir, f"out_{i}.json")) as f:
            outs[i] = json.load(f)
    return outdir, outs


def test_processes_agree_bitwise(mp_outputs):
    _, outs = mp_outputs
    assert outs[0]["is_main"] and not outs[1]["is_main"]
    # replicated params: every process holds the same global result
    np.testing.assert_array_equal(
        np.asarray(outs[0]["param_sums"]), np.asarray(outs[1]["param_sums"])
    )
    assert outs[0]["mean_step_reward"] == outs[1]["mean_step_reward"]
    assert outs[0]["value_loss"] == outs[1]["value_loss"]


def test_run_name_broadcast(mp_outputs):
    _, outs = mp_outputs
    # process 1 fed "proc1-name" in but must resolve process 0's name
    assert outs[0]["name"] == "proc0-name"
    assert outs[1]["name"] == "proc0-name"


def test_checkpoint_written_once_and_loadable(mp_outputs):
    outdir, outs = mp_outputs
    path = outs[0]["ckpt_path"]
    assert path == outs[1]["ckpt_path"]
    assert os.path.isdir(path), "process 0 must have written the checkpoint"
    # loadable with matching shapes (single-process restore)
    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.config.structs import (
        AlgorithmCfg, EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO,
    )
    from humanoid_tpu.env import XBotLEnv

    env = XBotLEnv(XBotLCfg(env=EnvCfg(num_envs=8)))
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(num_steps_per_env=2),
        algorithm=AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1),
    )
    runner = OnPolicyRunner(env, tcfg)
    runner.load(path)
    assert runner.iteration == 2
    import jax

    sums = [
        float(np.sum(np.asarray(leaf, dtype=np.float64)))
        for leaf in jax.tree.leaves(runner.train_state.params)
    ]
    np.testing.assert_allclose(sums, outs[0]["param_sums"], rtol=1e-6)


def test_matches_single_process(mp_outputs):
    """2 processes x 2 devices == 1 process x 4 devices, same seed (the
    collectives only change reduction grouping; fp32 tolerance)."""
    _, outs = mp_outputs
    import jax

    from humanoid_tpu.algo.runner import OnPolicyRunner
    from humanoid_tpu.config.structs import (
        AlgorithmCfg, EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO,
    )
    from humanoid_tpu.env import XBotLEnv
    from humanoid_tpu.parallel.mesh import make_mesh, shard_env_pytree

    env = XBotLEnv(XBotLCfg(env=EnvCfg(num_envs=8)))
    tcfg = XBotLCfgPPO(
        runner=RunnerCfg(num_steps_per_env=2),
        algorithm=AlgorithmCfg(num_mini_batches=2, num_learning_epochs=1),
    )
    runner = OnPolicyRunner(env, tcfg)
    mesh = make_mesh(jax.devices()[:4])
    carry = runner.init_carry()
    carry = shard_env_pytree(carry, mesh, 8)
    for _ in range(2):
        carry, metrics = runner._train_iter(carry)
    np.testing.assert_allclose(
        float(metrics.mean_step_reward), outs[0]["mean_step_reward"],
        atol=1e-5,
    )
    sums = [
        float(np.sum(np.asarray(leaf, dtype=np.float64)))
        for leaf in jax.tree.leaves(carry.train_state.params)
    ]
    np.testing.assert_allclose(
        sums, outs[0]["param_sums"], rtol=1e-4, atol=5e-4
    )
