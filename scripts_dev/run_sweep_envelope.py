"""Committed sweep artifact (VERDICT r4 missing #5): ingredient isolation
of the round-5 envelope recipe via the sweep subsystem
(scripts/sweep.py — BASELINE config 5's parallel sweep; sequential on one
host, partitioned by jax.process_index on a pod).

Grid (2 x 2): the directional low-speed band on/off x its scale, on
humanoid_ppo_envelope at 1200 iterations. Each point's final actor is
then judged on exactly the gate cells the recipe was built to fix —
backward / lateral_left / lateral_right (20 s MuJoCo replays, directional
tracking judge). Artifacts: validation/sweep_envelope/
{sweep_results.jsonl, cells.jsonl, SWEEP.md}.

Usage (chip idle):  python scripts_dev/run_sweep_envelope.py
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/validation/sweep_envelope"
LOG_ROOT = "/tmp/sweep_envelope"
SPEC = {
    "rewards.low_speed_directional": [False, True],
    "rewards.scales.low_speed": [0.2, 0.4],
}
ITERS = 1200
CELLS = ["backward", "lateral_left", "lateral_right"]


def main() -> None:
    shutil.rmtree(LOG_ROOT, ignore_errors=True)
    os.makedirs(LOG_ROOT, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)

    from humanoid_tpu.scripts.sweep import main as sweep_main

    sweep_main([
        "--task", "humanoid_ppo_envelope",
        "--spec", json.dumps(SPEC),
        "--max-iterations", str(ITERS),
        "--log-root", LOG_ROOT,
    ])

    results = [json.loads(l) for l in
               open(os.path.join(LOG_ROOT, "sweep_results.jsonl"))]

    # judge each point on the targeted cells (CPU MuJoCo)
    menv = dict(os.environ)
    menv["PALLAS_AXON_POOL_IPS"] = ""
    menv["JAX_PLATFORMS"] = "cpu"
    cells_path = os.path.join(OUT, "cells.jsonl")
    if os.path.exists(cells_path):
        os.unlink(cells_path)
    rows = []
    for i, rec in enumerate(results):
        part = os.path.join(LOG_ROOT, f"cells_{i}.jsonl")
        r = subprocess.run(
            [sys.executable, "-m", "humanoid_tpu.deploy.gate_matrix",
             "--load-model", rec["policy"], "--task",
             "humanoid_ppo_envelope", "--out", part, "--cells", *CELLS,
             "--iteration", str(i)],
            env=menv, cwd="/root/repo", capture_output=True, text=True,
            timeout=3600,
        )
        print(r.stdout[-600:], flush=True)
        verdicts = [json.loads(l) for l in open(part)]
        for v in verdicts:
            v["point"] = rec["point"]
            with open(cells_path, "a") as f:
                f.write(json.dumps(v) + "\n")
        rows.append((rec, verdicts))

    with open(os.path.join(LOG_ROOT, "sweep_results.jsonl")) as f:
        shutil.copyfile(f.name, os.path.join(OUT, "sweep_results.jsonl"))

    def v_of(v):
        seg = v.get("segments") or [{}]
        return seg[0].get("v_along")

    lines = [
        "# Envelope-recipe sweep (round 5)",
        "",
        f"`scripts/sweep.py` grid over `{json.dumps(SPEC)}` on "
        f"`humanoid_ppo_envelope`, {ITERS} iterations per point, judged on "
        "the three gate cells the recipe was built to fix (0.7x "
        "directional-tracking bar, 20 s MuJoCo replays).",
        "",
        "| directional | scale | reward | backward | lat_left | lat_right |",
        "|---|---|---|---|---|---|",
    ]
    for rec, verdicts in rows:
        p = rec["point"]
        by = {v["cell"]: v for v in verdicts}

        def cell(name):
            v = by.get(name, {})
            mark = "PASS" if v.get("passed") else "fail"
            va = v_of(v)
            return f"{mark} ({va})" if va is not None else mark

        lines.append(
            f"| {p['rewards.low_speed_directional']} "
            f"| {p['rewards.scales.low_speed']} "
            f"| {round(rec['mean_reward'], 2)} "
            f"| {cell('backward')} | {cell('lateral_left')} "
            f"| {cell('lateral_right')} |"
        )
    lines += [
        "",
        "Full per-cell verdicts: `cells.jsonl`; per-point training "
        "summaries: `sweep_results.jsonl`. The shipping recipe "
        "(directional=True, scale 0.4) is the grid point the full-length "
        "`envelope_r5b` run (10/10 matrix on four checkpoints) uses.",
    ]
    with open(os.path.join(OUT, "SWEEP.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
