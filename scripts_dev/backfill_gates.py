"""Backfill eval-gate verdicts for checkpoints whose async replays were
lost (e.g. a killed run): replays each missing gate_policy_<it>.npz with
the same sim2sim invocation + verdict the CheckpointEvalGate uses, and
appends the rows to the run's eval_gate.jsonl (sorted copy written).

Usage:
  python scripts_dev/backfill_gates.py RUN_DIR --task d11_ppo \
      [--cmd 0.5 0 0] [--extra --oracle-perturb 0.1] [--concurrent 2]
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--task", required=True)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--cmd", type=float, nargs=3, default=[0.5, 0.0, 0.0])
    ap.add_argument("--jsonl", default="eval_gate.jsonl")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    ap.add_argument("--concurrent", type=int, default=2)
    args = ap.parse_args()

    from humanoid_tpu.deploy.eval_gate import CheckpointEvalGate

    gate = CheckpointEvalGate(args.run_dir, duration=args.duration,
                              task=args.task, cmd=tuple(args.cmd))
    jsonl = os.path.join(args.run_dir, args.jsonl)
    done = set()
    if os.path.exists(jsonl):
        for line in open(jsonl):
            done.add(json.loads(line).get("iteration"))
    ckpts = sorted(
        int(f[len("gate_policy_"):-4])
        for f in os.listdir(args.run_dir)
        if f.startswith("gate_policy_") and f.endswith(".npz")
    )
    missing = [it for it in ckpts if it not in done]
    print(f"{len(done)} done, backfilling {len(missing)}: {missing}")

    menv = dict(os.environ)
    menv["PALLAS_AXON_POOL_IPS"] = ""
    menv["JAX_PLATFORMS"] = "cpu"
    running = []

    def reap(block):
        for it, proc, t0 in list(running):
            if block or proc.poll() is not None:
                out, _ = proc.communicate(timeout=3600)
                metrics = {}
                for line in reversed(out.strip().splitlines()):
                    if line.startswith("{"):
                        try:
                            metrics = ast.literal_eval(line)
                            break
                        except (ValueError, SyntaxError):
                            pass
                rec = {"iteration": it,
                       "wall_s": round(time.time() - t0, 1), **{
                           k: v for k, v in metrics.items()
                           if isinstance(v, (int, float))},
                       **gate.verdict(metrics), "backfilled": True}
                with open(jsonl, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"  @{it}: {'PASS' if rec['passed'] else 'FAIL'} "
                      f"({rec['criterion']})", flush=True)
                running.remove((it, proc, t0))

    for it in missing:
        while len(running) >= args.concurrent:
            reap(False)
            time.sleep(3)
        npz = os.path.join(args.run_dir, f"gate_policy_{it}.npz")
        argv = [sys.executable, "-m", "humanoid_tpu.deploy.sim2sim",
                "--load-model", npz, "--duration", str(args.duration),
                "--task", args.task, "--cmd", *map(str, args.cmd),
                "--heading-hold"] + list(args.extra)
        running.append((it, subprocess.Popen(
            argv, env=menv, cwd="/root/repo", stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True), time.time()))
    while running:
        reap(True)

    rows = [json.loads(l) for l in open(jsonl)]
    rows.sort(key=lambda r: r.get("iteration", 0))
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    n = sum(bool(r.get("passed")) for r in rows)
    late = [r for r in rows if r.get("iteration", 0) >= 600]
    print(f"total {n}/{len(rows)}; from 600: "
          f"{sum(bool(r.get('passed')) for r in late)}/{len(late)}")


if __name__ == "__main__":
    main()
