"""Weak-scaling benchmark over the env-axis device mesh.

BASELINE.md's driver targets call for scaling "measured at 1 chip, 1 host,
>=2 hosts". Real multi-chip hardware is not available in this container
(one TPU chip behind a tunnel), so this script measures what *can* be
measured anywhere: weak-scaling efficiency of the full jitted training
iteration (rollout + GAE + PPO) over an n-device mesh of virtual CPU
devices (the standard JAX way to test multi-device code without a
cluster, SURVEY.md §4). The communication surface is identical to the
real thing — GSPMD inserts the same all-reduces for advantage
normalization and gradients — only the interconnect differs (shared
memory instead of ICI).

Each device count runs in a fresh subprocess because
--xla_force_host_platform_device_count must be set before the CPU backend
initializes.

Usage:
  python -m humanoid_tpu.scripts.bench_scaling            # 1,2,4,8 devices
  python -m humanoid_tpu.scripts.bench_scaling --devices 1 2 4 \
      --envs-per-device 256 --out BENCH_SCALING.md
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = """
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, "/root/repo")

from humanoid_tpu.algo.runner import OnPolicyRunner
from humanoid_tpu.config.structs import EnvCfg, RunnerCfg, XBotLCfg, XBotLCfgPPO
from humanoid_tpu.env import XBotLEnv
from humanoid_tpu.parallel.mesh import make_mesh, shard_env_pytree

n = {n_devices}
envs = {envs_per_device} * n
T = {steps}
assert len(jax.devices()) == n, (n, jax.devices())
cfg = XBotLCfg(env=EnvCfg(num_envs=envs))
tcfg = XBotLCfgPPO(runner=RunnerCfg(num_steps_per_env=T))
env = XBotLEnv(cfg)
runner = OnPolicyRunner(env, tcfg)
mesh = make_mesh()
carry = runner.init_carry()
carry = shard_env_pytree(carry, mesh, envs)
for _ in range({warmup}):
    carry, _ = runner._train_iter(carry)
    jax.block_until_ready(carry.train_state.params)
times = []
for _ in range({iters}):
    t0 = time.time()
    carry, _ = runner._train_iter(carry)
    jax.block_until_ready(carry.train_state.params)
    times.append(time.time() - t0)
best = min(times)
print(json.dumps({{
    "devices": n, "envs": envs, "iter_s": best,
    "env_steps_per_sec": T * envs / best,
}}))
"""


def run_one(n: int, envs_per_device: int, steps: int, warmup: int,
            iters: int) -> dict:
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n}".strip()
    )
    env["JAX_PLATFORMS"] = "cpu"
    # skip the axon TPU backend registration in the subprocess (it hangs
    # when the tunnel pool is configured but the process wants CPU)
    env["PALLAS_AXON_POOL_IPS"] = ""
    code = _WORKER.format(
        n_devices=n, envs_per_device=envs_per_device, steps=steps,
        warmup=warmup, iters=iters,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=7200,
    )
    if out.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--envs-per-device", type=int, default=256)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="write a markdown table to this path")
    args = ap.parse_args(argv)

    rows = []
    for n in args.devices:
        r = run_one(n, args.envs_per_device, args.steps, args.warmup,
                    args.iters)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]["env_steps_per_sec"] / rows[0]["devices"]
    lines = [
        "# Weak scaling — full training iteration over the env-axis mesh",
        "",
        f"Virtual CPU devices ({args.envs_per_device} envs/device, "
        f"T={args.steps}); efficiency = throughput / (n x 1-device "
        "throughput). Rollout is embarrassingly parallel over envs; the "
        "only collectives are advantage-normalization stats and the "
        "gradient all-reduce (SURVEY.md §5.8).",
        "",
        "| devices | envs | iter time (s) | env-steps/s | efficiency |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        eff = r["env_steps_per_sec"] / (base * r["devices"])
        lines.append(
            f"| {r['devices']} | {r['envs']} | {r['iter_s']:.3f} "
            f"| {r['env_steps_per_sec']:,.0f} | {eff:.2f} |"
        )
    table = "\n".join(lines) + "\n"
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
