"""Committed terrain-throughput breakdown (VERDICT r4 next #6): separate
the terrain task's in-run 1.1 M env-steps/s (vs 3.75 M flat) into
  (a) the terrain physics/sampler cost itself,
  (b) checkpoint export + save I/O,
  (c) eval-gate CPU contention (MuJoCo replays sharing the 2-core host
      with the TPU feed).

Protocol: 200-iteration segments of the registered terrain task on the
real chip, identical but for the I/O hooks:
  1. bare        — no checkpoints, no gates (pure train loop)
  2. +ckpt       — save_interval 50 (4 saves + npz exports)
  3. +gates      — 2 like the validation runs: per-checkpoint flat gate
                   (2 concurrent) + terrain gate (1), 60 s replays
  4. flat bare   — the flat flagship task, same protocol as 1 (reference
                   point for the terrain delta)

Writes validation/terrain_profile_r5/BREAKDOWN.md.
Usage (chip idle):  python scripts_dev/profile_terrain_breakdown.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/validation/terrain_profile_r5"
LOG_ROOT = "/tmp/terrain_breakdown"
ITERS = 200
N, T = 4096, 60


def run_segment(tag, task, save_interval=None, gates=False):
    from humanoid_tpu.deploy.eval_gate import CheckpointEvalGate
    from humanoid_tpu.utils import registry

    env_cfg, tcfg = registry.get_cfgs(task)
    if save_interval:
        tcfg = tcfg.replace(
            runner=dataclasses.replace(tcfg.runner,
                                       save_interval=save_interval)
        )
    else:
        tcfg = tcfg.replace(
            runner=dataclasses.replace(tcfg.runner, save_interval=10**9)
        )
    env, env_cfg = registry.make_env(task, env_cfg=env_cfg)
    runner, tcfg = registry.make_alg_runner(
        env, task, log_root=os.path.join(LOG_ROOT, tag), train_cfg=tcfg
    )
    gate = gate_t = None
    if gates:
        gate = CheckpointEvalGate(runner.log_dir, duration=60.0, task=task,
                                  max_concurrent=2)
        gate_t = CheckpointEvalGate(
            runner.log_dir, duration=60.0, task=task, max_concurrent=1,
            extra_argv=("--terrain",), cmd=(0.3, 0.0, 0.0),
            jsonl_name="eval_gate_terrain.jsonl", export=False,
        )

        def on_ckpt(r, p, it):
            gate(r, p, it)
            gate_t(r, p, it)

        runner.on_checkpoint = on_ckpt

    # warm up compile outside the timed window
    carry = runner.learn(2, init_at_random_ep_len=True)
    t0 = time.time()
    runner.learn(ITERS, carry=carry)
    wall = time.time() - t0
    steps = ITERS * N * T
    rec = {"tag": tag, "task": task, "iters": ITERS,
           "wall_s": round(wall, 1),
           "ms_per_iter": round(wall / ITERS * 1e3, 1),
           "env_steps_per_s": round(steps / wall)}
    if gates:
        gate.wait_all(timeout=7200)
        gate_t.wait_all(timeout=7200)
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    shutil.rmtree(LOG_ROOT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    rows = [
        run_segment("terrain_bare", "humanoid_ppo_terrain"),
        run_segment("terrain_ckpt", "humanoid_ppo_terrain",
                    save_interval=50),
        run_segment("terrain_gates", "humanoid_ppo_terrain",
                    save_interval=50, gates=True),
        run_segment("flat_bare", "humanoid_ppo"),
    ]
    by = {r["tag"]: r for r in rows}
    tb, tc, tg, fb = (by["terrain_bare"], by["terrain_ckpt"],
                      by["terrain_gates"], by["flat_bare"])
    lines = [
        "# Terrain in-run throughput breakdown (round 5)",
        "",
        f"200-iteration timed segments on the real chip ({N} envs x {T} "
        "steps), compile warmed, quiet host except where the row itself "
        "adds load. Produced by scripts_dev/profile_terrain_breakdown.py.",
        "",
        "| segment | ms/iter | env-steps/s |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['tag']} | {r['ms_per_iter']} "
                     f"| {r['env_steps_per_s']:,} |")
    lines += [
        "",
        "Attribution:",
        f"- terrain physics+sampler vs flat: {fb['ms_per_iter']} -> "
        f"{tb['ms_per_iter']} ms/iter "
        f"(+{round(tb['ms_per_iter'] - fb['ms_per_iter'], 1)} ms)",
        f"- checkpoint export/save I/O: +"
        f"{round(tc['ms_per_iter'] - tb['ms_per_iter'], 1)} ms/iter at "
        "save_interval 50 (4x the validation cadence)",
        f"- eval-gate CPU contention: +"
        f"{round(tg['ms_per_iter'] - tc['ms_per_iter'], 1)} ms/iter with "
        "both verdict streams live (2-core host feeds the TPU and "
        "replays MuJoCo simultaneously)",
    ]
    with open(os.path.join(OUT, "BREAKDOWN.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(OUT, "segments.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
