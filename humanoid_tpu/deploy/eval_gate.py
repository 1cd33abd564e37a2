"""Per-checkpoint sim2sim eval gate.

BASELINE.json config 4 calls for a training pipeline that runs the MuJoCo
sim2sim acceptance check at *each checkpoint* (the reference only ever ran
it manually at the end, sim2sim.py:302). The gate exports the current
actor to a portable .npz and replays it in MuJoCo in an async CPU
subprocess, so the TPU training loop never blocks; results stream into
`<log_dir>/eval_gate.jsonl` and the console as they land.

Pass criterion: the policy survives the full gate duration (the
reference's de facto acceptance test is surviving the replay window,
SURVEY.md §4.2).
"""
from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
import time
from typing import List, Optional, Tuple


class CheckpointEvalGate:
    """Callable checkpoint hook: export -> async MuJoCo replay -> verdict."""

    def __init__(self, log_dir: str, duration: float = 10.0,
                 cmd: Tuple[float, float, float] = (0.5, 0.0, 0.0),
                 max_concurrent: int = 1, task: str = ""):
        self.log_dir = log_dir
        self.duration = duration
        self.cmd = cmd
        self.task = task
        self.max_concurrent = max_concurrent
        self.jsonl_path = os.path.join(log_dir, "eval_gate.jsonl")
        self._procs: List[Tuple[int, str, subprocess.Popen, float]] = []
        self.results: List[dict] = []

    # -- checkpoint hook (called by OnPolicyRunner.save) ------------------

    def __call__(self, runner, ckpt_path: str, iteration: int) -> None:
        from .export import export_policy_npz

        self.poll()
        if len(self._procs) >= self.max_concurrent:
            # never queue unboundedly: skip this checkpoint's gate rather
            # than stall training or pile up CPU replays
            self._log({"iteration": iteration, "skipped": True,
                       "reason": "gate backlog"})
            return
        npz = os.path.join(self.log_dir, f"gate_policy_{iteration}.npz")
        export_policy_npz(runner.train_state.params, npz)
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""    # CPU-only subprocess
        env["JAX_PLATFORMS"] = "cpu"
        env.setdefault("MUJOCO_GL", "disable")
        argv = [sys.executable, "-m", "humanoid_tpu.deploy.sim2sim",
                "--load-model", npz, "--duration", str(self.duration),
                "--cmd", *map(str, self.cmd),
                "--plot",
                os.path.join(self.log_dir, f"gate_dashboard_{iteration}.png")]
        if self.task:
            argv += ["--task", self.task]
        proc = subprocess.Popen(
            argv,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd="/root/repo",
        )
        self._procs.append((iteration, npz, proc, time.time()))

    # -- bookkeeping -------------------------------------------------------

    def poll(self) -> None:
        """Reap finished gate subprocesses and record verdicts."""
        live = []
        for it, npz, proc, t0 in self._procs:
            if proc.poll() is None:
                live.append((it, npz, proc, t0))
                continue
            out, err = proc.communicate()
            rec = {"iteration": it, "wall_s": round(time.time() - t0, 1)}
            try:
                metrics = ast.literal_eval(out.strip().splitlines()[-1])
                rec.update(metrics)
                rec["passed"] = bool(
                    metrics.get("survived_s", 0.0) >= self.duration - 1e-6
                )
            except Exception:
                rec["passed"] = False
                rec["error"] = (err or out).strip()[-500:]
            self._log(rec)
        self._procs = live

    def wait_all(self, timeout: float = 600.0) -> None:
        deadline = time.time() + timeout
        while self._procs and time.time() < deadline:
            self.poll()
            if self._procs:
                time.sleep(2.0)
        for it, npz, proc, _ in self._procs:
            proc.kill()
            self._log({"iteration": it, "passed": False,
                       "error": "gate timeout"})
        self._procs = []

    def _log(self, rec: dict) -> None:
        self.results.append(rec)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        tag = ("PASS" if rec.get("passed") else
               ("SKIP" if rec.get("skipped") else "FAIL"))
        print(f"[eval-gate] iter {rec.get('iteration')}: {tag} "
              f"{ {k: v for k, v in rec.items() if k not in ('iteration',)} }",
              flush=True)
