"""Produce the committed validation artifacts under /root/repo/validation/
(VERDICT r1 next #4: every README headline number traceable to a committed
artifact).

Runs, sequentially on the real TPU chip:
  ab_bf16      flagship, 800 iters, default numerics (bf16 + granule 8)
  ab_fp32      flagship, 800 iters, compute_dtype=float32
  ab_granule1  flagship, 800 iters, shuffle_granule=1
  flagship     humanoid_ppo, 3001 iters, sim2sim eval gate per checkpoint
  d11          d11_ppo, 3001 iters

Artifacts copied per run: metrics.jsonl (reward/loss/fps per iteration),
eval_gate.jsonl + final gate dashboard PNG (gated runs), summary.json.

Usage:  python scripts_dev/run_validation.py [--quick] [--only TAG]
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

VAL_ROOT = "/root/repo/validation"
LOG_ROOT = "/tmp/validation_runs"


def run_one(tag: str, task: str, iters: int, train_mut=None,
            gate_s: float | None = None, seed: int | None = None,
            defer_gate: bool = False, env_mut=None,
            terrain_gate: bool = False, terrain_cmd=(0.5, 0.0, 0.0),
            matrix: bool = False, gate_argv: tuple = (),
            matrix_ckpts: tuple = (), matrix_argv: tuple = (),
            terrain_gate_argv: tuple = ("--terrain",)):
    """Train one run. Returns (summary, finish) where finish() drains the
    eval gate (if any) and writes the final summary/artifacts. With
    defer_gate the caller invokes finish() later, so CPU MuJoCo replays
    overlap the next run's TPU training (this host has 2 cores; a 60 s
    replay costs ~1.5-3 min while training a full run takes ~5)."""
    from humanoid_tpu.deploy.eval_gate import CheckpointEvalGate
    from humanoid_tpu.utils import registry
    from humanoid_tpu.utils.logging import TrainLogger

    print(f"=== {tag}: task={task} iters={iters} seed={seed} ===",
          flush=True)
    env_cfg0, tcfg = registry.get_cfgs(task)
    if seed is not None:
        env_cfg0 = env_cfg0.replace(seed=seed)
        tcfg = tcfg.replace(seed=seed)
    if env_mut is not None:
        env_cfg0 = env_mut(env_cfg0)
    env, env_cfg = registry.make_env(task, env_cfg=env_cfg0)
    if train_mut is not None:
        tcfg = train_mut(tcfg)
    runner, tcfg = registry.make_alg_runner(
        env, task, log_root=os.path.join(LOG_ROOT, tag), train_cfg=tcfg
    )
    logger = TrainLogger(runner.log_dir, env.reward_names, env_cfg, tcfg)
    gate = None
    gate_t = None
    if gate_s:
        gate = CheckpointEvalGate(runner.log_dir, duration=gate_s,
                                  task=task, max_concurrent=2,
                                  extra_argv=tuple(gate_argv))
        runner.on_checkpoint = gate
        if terrain_gate:
            # second verdict stream: same checkpoints replayed on the
            # reference's terrain MJCF (XBot-L-terrain.xml + uneven.png,
            # ~+-17 cm bumps) — the reference lineage's terrain
            # acceptance surface (VERDICT r3 next #1)
            gate_t = CheckpointEvalGate(
                runner.log_dir, duration=gate_s, task=task,
                max_concurrent=1, extra_argv=tuple(terrain_gate_argv),
                cmd=terrain_cmd,
                jsonl_name="eval_gate_terrain.jsonl", export=False,
            )

            def on_ckpt(r, p, it, _g=gate, _gt=gate_t):
                _g(r, p, it)
                _gt(r, p, it)

            runner.on_checkpoint = on_ckpt

    def log_fn(it, m, fps, dt):
        s = logger.log(it, m, fps, dt)
        if it % 100 == 0:
            print(f"[{tag}] it {it}/{iters} "
                  f"rew {s['Train/mean_reward']:.3f} fps {fps:,.0f}",
                  flush=True)

    t0 = time.time()
    runner.learn(iters, init_at_random_ep_len=True, log_fn=log_fn)
    wall = time.time() - t0
    logger.close()
    if gate is not None and defer_gate:
        gate.drain_async()
    if gate_t is not None and defer_gate:
        gate_t.drain_async()

    import jax

    last = None
    rows = []
    with open(os.path.join(runner.log_dir, "metrics.jsonl")) as f:
        for line in f:
            last = json.loads(line)
            rows.append(last)

    def tail_mean(key, n=200):
        vals = [r[key] for r in rows[-n:] if key in r]
        return round(sum(vals) / len(vals), 4) if vals else None
    summary = {
        "tag": tag,
        "task": task,
        "iterations": iters,
        "wall_s": round(wall, 1),
        "backend": jax.default_backend(),
        "num_envs": env_cfg.env.num_envs,
        "steps_per_env": tcfg.runner.num_steps_per_env,
        "env_steps_per_s": round(
            iters * tcfg.runner.num_steps_per_env * env_cfg.env.num_envs
            / wall
        ),
        "final_mean_reward": last.get("Train/mean_reward") if last else None,
        "final_mean_ep_len": last.get("Train/mean_episode_length") if last else None,
        "final_ep_fail_frac": last.get("Train/ep_fail_frac") if last else None,
        # single-iteration finals are episode-sampling noise (+-15%); the
        # tail mean is the steady-state number
        "tail200_mean_reward": tail_mean("Train/mean_reward"),
        "tail200_mean_ep_len": tail_mean("Train/mean_episode_length"),
        "tail200_ep_fail_frac": tail_mean("Train/ep_fail_frac"),
        "compute_dtype": tcfg.policy.compute_dtype,
        "shuffle_granule": tcfg.algorithm.shuffle_granule,
        "contact_model": env_cfg.sim.contact_model,
        "gate_duration_s": gate_s,
        "seed": tcfg.seed,
        "run_dir": runner.log_dir,
    }

    def finish():
        if gate is not None:
            gate.wait_all(timeout=7200)
        if gate_t is not None:
            gate_t.wait_all(timeout=7200)
        out_dir = os.path.join(VAL_ROOT, tag)
        os.makedirs(out_dir, exist_ok=True)
        if matrix or matrix_ckpts:
            # command-matrix + push-recovery gate. Default: FINAL
            # checkpoint only (VERDICT r3 next #4). matrix_ckpts: also on
            # those earlier checkpoints, rows tagged with --iteration, to
            # establish CHECKPOINT STABILITY (VERDICT r4 next #1: 9/9 on
            # >=2 consecutive checkpoints). Two replays run concurrently
            # (this host has 2 cores).
            import subprocess
            import sys as _sys

            its = sorted(set(list(matrix_ckpts) + [iters]))
            jobs = []
            for it in its:
                npz = os.path.join(runner.log_dir, f"gate_policy_{it}.npz")
                if not os.path.exists(npz):
                    if it != iters:
                        print(f"[{tag}] matrix ckpt {it}: no npz, skipped",
                              flush=True)
                        continue
                    from humanoid_tpu.deploy.export import export_policy_npz

                    export_policy_npz(runner.train_state.params, npz)
                jobs.append((it, npz))
            menv = dict(os.environ)
            menv["PALLAS_AXON_POOL_IPS"] = ""
            menv["JAX_PLATFORMS"] = "cpu"
            mj = os.path.join(runner.log_dir, "gate_matrix.jsonl")
            running = []

            def _reap(block):
                for i, (it, proc, part) in enumerate(list(running)):
                    if block or proc.poll() is not None:
                        out, _ = proc.communicate(timeout=3600)
                        print(f"[{tag}] matrix @{it}:\n{out[-1200:]}",
                              flush=True)
                        if os.path.exists(part):
                            with open(part) as f, open(mj, "a") as g:
                                g.write(f.read())
                            os.unlink(part)
                        running.remove((it, proc, part))

            for it, npz in jobs:
                while len(running) >= 2:
                    _reap(block=False)
                    time.sleep(5)
                part = mj + f".part{it}"
                argv = [_sys.executable, "-m",
                        "humanoid_tpu.deploy.gate_matrix",
                        "--load-model", npz, "--task", task, "--out", part,
                        "--iteration", str(it)] + list(matrix_argv)
                running.append((it, subprocess.Popen(
                    argv, env=menv, cwd="/root/repo",
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True), part))
            while running:
                _reap(block=True)
            by_it = {}
            if os.path.exists(mj):
                for line in open(mj):
                    r = json.loads(line)
                    by_it.setdefault(r.get("iteration", iters), []).append(r)
            last = by_it.get(iters, [])
            summary["matrix_cells_passed"] = sum(
                bool(r.get("passed")) for r in last)
            summary["matrix_cells_total"] = len(last)
            if len(by_it) > 1:
                summary["matrix_by_iteration"] = {
                    str(it): f"{sum(bool(r.get('passed')) for r in v)}"
                             f"/{len(v)}"
                    for it, v in sorted(by_it.items())
                }
        for f in ("metrics.jsonl", "eval_gate.jsonl",
                  "eval_gate_terrain.jsonl", "gate_matrix.jsonl"):
            p = os.path.join(runner.log_dir, f)
            if os.path.exists(p):
                shutil.copy(p, out_dir)
        # commit the converged policy for independent replay (like
        # validation/transfer_s5/policy_3001.npz)
        final_npz = os.path.join(runner.log_dir, f"gate_policy_{iters}.npz")
        if os.path.exists(final_npz):
            shutil.copy(final_npz,
                        os.path.join(out_dir, f"policy_{iters}.npz"))
        dashboards = sorted(
            (f for f in os.listdir(runner.log_dir)
             if f.startswith("gate_dashboard")),
            key=lambda f: int(f.split("_")[-1].split(".")[0]),
        )
        if dashboards:
            shutil.copy(os.path.join(runner.log_dir, dashboards[-1]),
                        os.path.join(out_dir, "gate_dashboard_final.png"))
        if gate is not None:
            n_pass = sum(1 for r in gate.results if r.get("passed"))
            summary["gate_passed"] = n_pass
            summary["gate_total"] = len(gate.results)
            late = [r for r in gate.results
                    if r.get("iteration", 0) >= 600]
            summary["gate_passed_from_600"] = sum(
                1 for r in late if r.get("passed"))
            summary["gate_total_from_600"] = len(late)
        if gate_t is not None:
            late_t = [r for r in gate_t.results
                      if r.get("iteration", 0) >= 600]
            summary["terrain_gate_passed"] = sum(
                1 for r in gate_t.results if r.get("passed"))
            summary["terrain_gate_total"] = len(gate_t.results)
            summary["terrain_gate_passed_from_600"] = sum(
                1 for r in late_t if r.get("passed"))
            summary["terrain_gate_total_from_600"] = len(late_t)
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[{tag}] done: {summary}", flush=True)
        return summary

    if not defer_gate:
        finish()
    return summary, finish


def main() -> None:
    quick = "--quick" in sys.argv
    only = None
    if "--only" in sys.argv:
        # comma-separated tags run sequentially with deferred gates, so
        # one run's CPU MuJoCo replays overlap the next run's TPU training
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    ab_iters = 50 if quick else 800
    full_iters = 50 if quick else 3001

    def fp32(t):
        return t.replace(
            policy=dataclasses.replace(t.policy, compute_dtype="float32")
        )

    def granule1(t):
        return t.replace(
            algorithm=dataclasses.replace(t.algorithm, shuffle_granule=1)
        )

    def _save200(t):
        return t.replace(
            runner=dataclasses.replace(t.runner, save_interval=200)
        )

    agenda = [
        ("ab_bf16", "humanoid_ppo", ab_iters, None, None, None),
        ("ab_fp32", "humanoid_ppo", ab_iters, fp32, None, None),
        ("ab_granule1", "humanoid_ppo", ab_iters, granule1, None, None),
        ("flagship", "humanoid_ppo", full_iters, None, 60.0, None),
        ("d11", "d11_ppo", full_iters, None, 60.0, None),
        # cross-model robustness run (VALIDATION.md open frontier): extended
        # DR over the exact axis of the training-model/reference-MJCF delta
        # (link mass/COM/inertia), gated against the reference MJCF.
        ("robust", "humanoid_ppo_robust", full_iters, None, 60.0, None),
        # --- round-3 rows ---
        # contact-model A/B: flagship rewards/DR, constraint-based contact
        ("flagship_pgs", "humanoid_ppo_pgs", full_iters, None, 60.0, None),
        # the shipping transfer recipe (PGS + extended DR + tracking-biased
        # rewards), at 3 seeds (VERDICT r2 next #6: multi-seed evidence)
        ("transfer_s5", "humanoid_ppo_transfer", full_iters, None, 60.0, 5),
        ("transfer_s17", "humanoid_ppo_transfer", full_iters, None, 60.0,
         17),
        ("transfer_s42", "humanoid_ppo_transfer", full_iters, None, 60.0,
         42),
        # symmetry-loss variant, trained end-to-end (VERDICT r2 next #7)
        ("sym", "humanoid_ppo_sym", full_iters, None, 60.0, None),
        # --- round-4 rows ---
        # terrain curriculum (BASELINE config 3, VERDICT r3 next #1):
        # heightfield + 187-pt height scan in the critic + PGS contact,
        # Pallas heightfield sampler; gated per checkpoint on BOTH the
        # flat reference MJCF and the reference terrain MJCF
        ("terrain_pgs", "humanoid_ppo_terrain", full_iters, None, 60.0,
         None),
        # trimesh-collision variant over the generic base generator set
        ("trimesh_pgs", "humanoid_ppo_trimesh", full_iters, None, 60.0,
         None),
        # round-4 solver A/B (frozen Delassus prep + 6 warm-started
        # sweeps, 4.0 M env-steps/s): measured TRANSFER-BREAKING — gate
        # 8/26 from 600, matrix 1/9, late checkpoints fall at ~5 s on the
        # reference MJCF (the round-2 failure signature). Kept as the
        # committed record of why the shipping default stays cold-8 with
        # per-substep prep; re-run with _warm6_freeze.
        ("flagship_warm6", "humanoid_ppo", full_iters, None, 60.0, None,
         dict(matrix=True, env_mut=_warm6_freeze)),
        # ingredient isolation: frozen prep ALONE (cold 8 sweeps,
        # 3.81 M env-steps/s). Result: GREEN (26/26 + 8/9 matrix) — the
        # warm-start was the culprit; pgs_freeze_prep now ships on every
        # registered task (the env_mut is redundant but kept so the row
        # reproduces even if defaults change again).
        ("flagship_freeze8", "humanoid_ppo", full_iters, None, 60.0, None,
         dict(matrix=True, env_mut=_freeze_prep_only)),
        # seed confirmation of the shipping (freeze-prep) default
        ("flagship_r4_s17", "humanoid_ppo", full_iters, None, 60.0, 17),
        ("flagship_r4_s42", "humanoid_ppo", full_iters, None, 60.0, 42),
        # omnidirectional-envelope recipe (VERDICT r3 next #4): widened
        # command box; judged on the full gate matrix
        ("omni", "humanoid_ppo_omni", full_iters, None, 60.0, None,
         dict(matrix=True)),
        # terrain round 2 (the round-4 shipping terrain recipe): the
        # "uneven" curriculum slot matching the oracle's spectrum +
        # extended DR + tracking rewards now live IN the registered task;
        # 2x training budget, checkpoints every 200 iters (31 verdicts),
        # terrain-MJCF gate at a terrain-appropriate 0.3 m/s command
        # (the uneven.png surface has ~30% grades)
        ("terrain_uneven", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0))),
        # omni round 2: omni reached 7/9 matrix cells (backward 0.51x,
        # lateral_right 0.55x; lateral_LEFT passes — a chiral gait).
        # tracking_sigma=5 saturates at small commands (exp(-5*err^2) =
        # 0.89 while moving at HALF a 0.3 m/s command): sharpen to 12 so
        # small-command tracking has gradient, and add the validated
        # mirror-symmetry loss (sym_pgs: 26/26) against the asymmetry.
        ("omni_sym", "humanoid_ppo_omni", full_iters, _sym_loss, 60.0,
         None, dict(matrix=True, env_mut=_sharp_tracking)),
        # omni round 3: omni_sym fixed backward (8/9); lateral_right at
        # 0.64x of command vs the 0.7x bar — double the training budget
        ("omni_sym_6k", "humanoid_ppo_omni", 6000, _sym_save200, 60.0,
         None, dict(matrix=True, env_mut=_sharp_tracking)),
        # terrain round 3: terrain_uneven's policy walks the oracle for
        # ~38 s but dies on ~30% pockets it rarely trained on — the game
        # curriculum only reached level ~1.9/9 in 6000 iters (heading
        # commands resample 3x/episode, so net displacement rarely clears
        # the 4 m promotion bar). Spread the INITIAL level over all rows
        # (max_init_terrain_level 5 -> 10; failing envs still sink) so
        # every difficulty is trained from the start.
        ("terrain_hard", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              env_mut=_init_all_levels)),
        # terrain round 4: terrain_hard's init-level spread washes out
        # within ~10 episodes (failed episodes demote faster than init
        # helps; level mean back to ~1.7 by iter 1400). The durable fix
        # is the exploration tier: 30% of resetting envs draw a uniform
        # random difficulty row, keeping every difficulty trained at a
        # constant rate for the whole run.
        ("terrain_mix", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              env_mut=_explore_levels)),
        # d11 round 4 (VERDICT r3 next #5): per-joint action scale (arms
        # 0.1 — the fork's own commented-out intention) against the
        # round-3 56% in-sim failure rate, gated on a PERTURBED exported
        # MJCF (~10% mass/inertia/COM deltas — the measured 12-dof
        # model-gap scale) so the 18-dof gate crosses a model gap too
        ("d11_r4", "d11_ppo", full_iters, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"))),
        # --- round-5 rows ---
        # deployment-envelope recipe (VERDICT r4 next #1): axis-pure
        # command practice + 0.8 m/s vx envelope + sigma-12 tracking +
        # sym loss, all IN the registered task. Matrix on the last four
        # checkpoints (2800/2900/3000/3001) — the committed claim is 9/9
        # on >=2 CONSECUTIVE checkpoints; --fast-cell additionally
        # records the 0.8 m/s joystick-max stretch cell (10th row, not
        # part of the 9-cell criterion).
        ("envelope_r5", "humanoid_ppo_envelope", full_iters, None, 60.0,
         None,
         dict(matrix_ckpts=(2800, 2900, 3000),
              matrix_argv=("--fast-cell",))),
        # envelope round 2: r5 passed forward_fast/turns/push but every
        # 0.3 m/s cell undertracked uniformly at ~0.67x — the low_speed
        # floor polices only |vx| in the reference semantics. r5b adds
        # the directional low_speed band (low_speed_directional=True,
        # scale 0.2 -> 0.4), now part of the registered envelope task.
        ("envelope_r5b", "humanoid_ppo_envelope", full_iters, None, 60.0,
         None,
         dict(matrix_ckpts=(2800, 2900, 3000),
              matrix_argv=("--fast-cell",))),
        # round-5 perf stack (VERDICT r4 next #3), now the SHIPPING
        # defaults this plain row exercises end-to-end: shuffle granule
        # 64, 4 cold PGS sweeps (frozen prep), batched post-rollout
        # critic pass, K=50 superstep (4.5-4.6 M env-steps/s bench).
        # Gated like any solver/trainer change — the defaults stay only
        # if 26/26 from 600 + matrix hold; fallback ladder: pgs6
        # (4.3 M), then round-4 pgs8/granule8 (3.8 M).
        # RESULT: pgs4 REJECTED — 20/26 from 600 (falls band 1100-1700),
        # matrix 6/9 at convergence. Committed as the negative record
        # (validation/flagship_r5); run with env_mut=_pgs4 to reproduce.
        ("flagship_r5", "humanoid_ppo", full_iters, None, 60.0, None,
         dict(matrix_ckpts=(2900, 3000), env_mut=_pgs4)),
        # RESULT: granule 64 + pgs6 ALSO rejected — 22/26 from 600
        # (falls band 1100-2000), though late checkpoints walk 0.60 m/s.
        # Together with flagship_r5 this convicts the 64-row shuffle
        # granule (the shared ingredient; rounds 3-4 had six clean runs
        # at granule 8). Reproduce with train_mut=_granule64.
        ("flagship_r5b", "humanoid_ppo", full_iters, _granule64, 60.0,
         None, dict(matrix_ckpts=(2900, 3000),)),
        # the SHIPPING round-5 defaults (granule 8, pgs6 frozen-prep,
        # K=50, actor-only rollout scan + batched value pass): the plain
        # task after the registry flip to 6 sweeps — isolates the solver
        # change from the rejected shuffle change.
        ("flagship_r5c", "humanoid_ppo", full_iters, None, 60.0, None,
         dict(matrix_ckpts=(2900, 3000),)),
        # terrain round 5 (VERDICT r4 next #2): the tracking-verdict
        # curriculum + 10% exploration floor now live in the registered
        # task; occupancy histogram recorded per iteration. Same dual
        # gate as terrain_mix (flat 0.5 + terrain-MJCF 0.3).
        ("terrain_track", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0))),
        # terrain round 5b: terrain_track held difficulty (level mean 5.5,
        # flat 28/28) but its policies overspeed the 0.3 m/s oracle
        # command (0.35-0.5 m/s replays) and fall at 6-9 s — the same
        # imprecise-speed failure the envelope A/B isolated. The terrain
        # recipe now ships the directional low-speed band + sigma 12
        # (registry _terrain_rewards).
        ("terrain_track2", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0))),
        # terrain round 5c: track2 still overspeeds (0.5 m/s replays,
        # in-sim low_speed mean ~0 = mostly in the free too_high branch) —
        # on hard terrain momentum is survival-optimal, so overspeed must
        # be strictly penalized and the curriculum must not promote past
        # the precision frontier: too_high r = -1 and promote_quality
        # 0.55 -> 0.7.
        ("terrain_track3", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              env_mut=_precise_terrain)),
        # terrain round 5d: track3 improved 0/30 -> 7/30 but only ~2
        # difficulty rows ever reach the oracle's +-0.175 m intensity
        # (uneven amplitude 0.2*d). track4 puts the oracle's intensity at
        # MID difficulty (amplitude 0.35) and makes the uneven slot 55%
        # of cells, so most of the population trains on oracle-like and
        # harder ground.
        ("terrain_track4", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              env_mut=_oracle_terrain)),
        # d12 first-ever training run (VERDICT r4 next #4): full 18-dof
        # extended-feature workload, gated like d11_r4 (perturbed
        # exported-model oracle) + the command/push matrix.
        ("d12_r5", "d12_ppo", full_iters, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"), matrix=True)),
        # d11 round 5: the envelope fixes applied to the 18-dof task
        # (axis-pure practice + directional low-speed floor + sigma 12).
        ("d11_r5", "d11_ppo", full_iters, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"), matrix=True,
              env_mut=_envelope_fixes)),
        # d11/d12 round 5b: r5's remaining matrix failures are FALLS on
        # axis-pure backward/lateral commands (not undertracking) — the
        # same edge-of-the-training-box fragility the 12-dof omni recipe
        # fixed by widening the command box so the matrix commands are
        # interior. + the envelope fixes, 4500 iters, matrix on the last
        # two checkpoints for stability.
        ("d11_r5b", "d11_ppo", 4500, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"),
              matrix_ckpts=(4300, 4400), env_mut=_envelope_omni)),
        ("d12_r5b", "d12_ppo", 4500, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"),
              matrix_ckpts=(4300, 4400), env_mut=_envelope_omni)),
        # d12 round 5c: continue the WORKING d12_r5b recipe (envelope
        # fixes + omni box, 4500 it, 8/9 on three consecutive ckpts) and
        # attack its one failing cell — turn_right undertracks yaw
        # (-0.17 vs the -0.21 bar). The matrix turn command (0.3 rad/s)
        # sits exactly on the ang_vel_yaw training-box EDGE (+-0.3), the
        # same edge-of-box fragility the lin cells had: widen yaw
        # practice to +-0.4 and double the yaw-tracking weight.
        ("d12_r5c", "d12_ppo", 4500, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"),
              matrix_ckpts=(4300, 4400), env_mut=_envelope_omni_yaw)),
        # d11 round 5c: d11_r5b's omni-box destabilization began at
        # ~3500 of 4500 iters — every checkpoint BEFORE it was healthy.
        # Same recipe stopped at the reference budget (3001), matrix on
        # the last three checkpoints; also take the yaw-practice fix.
        ("d11_r5c", "d11_ppo", full_iters, None, 60.0, None,
         dict(gate_argv=("--oracle-perturb", "0.1"),
              matrix_ckpts=(2900, 3000), env_mut=_envelope_omni_yaw)),
        # trimesh round 5 (VERDICT r4 next #5): transfer recipe now in
        # the registered task; second verdict stream replays every
        # checkpoint on a synthesized NON-FLAT oracle (discrete-obstacle
        # course from our own generators, deploy/terrain_oracle.py).
        ("trimesh_r5", "humanoid_ppo_trimesh", full_iters, None, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              terrain_gate_argv=("--hfield-oracle", "discrete:0.5"))),
        # trimesh round 5b: trimesh_r5 hit a physics blow-up at iter 350
        # (NaN state never terminates — NaN comparisons are False — and
        # one NaN reward reaches the global advantage normalization,
        # killing the run). The env now detects non-finite states,
        # resets them, and zeroes their reward row (tests/test_env.py::
        # test_nan_state_detected_and_reset); rerun of the same recipe.
        ("trimesh_r5b", "humanoid_ppo_trimesh", full_iters, None, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              terrain_gate_argv=("--hfield-oracle", "discrete:0.5"))),
        # trimesh round 5c: r5b trains through (the non-finite guard
        # holds; flat 22/22 from 1000) but 0/26 on the discrete:0.5
        # oracle (0.15 m obstacles) with 55% in-sim fail-frac — the base
        # set's gap/pit cells dominate failures while teaching nothing
        # the oracle needs. Rebalance the mix toward the oracle's
        # step-like features (stairs 30% / discrete 25%, gap+pit 10%)
        # and gate on discrete:0.3 (0.11 m obstacles — still a genuine
        # vertical-face course, oracle-matched to what the reference's
        # own HumanoidTerrain caps obstacles at: 0.04*2.. per terrain.py
        # :189-231 gentling).
        ("trimesh_r5c", "humanoid_ppo_trimesh", full_iters, None, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              terrain_gate_argv=("--hfield-oracle", "discrete:0.3"),
              env_mut=_trimesh_oracle_mix)),
        # terrain round 5e: the round-5 frontier analysis says sigma-12 +
        # directional band recipes lock at ~0.4 m/s replays and fall,
        # while terrain_mix's sigma-5 recipe settles at a SURVIVING
        # 0.35 m/s (15/28, the standing best). terrain_track5 combines
        # that sigma-5 attractor recipe with the round-5 tracking-verdict
        # curriculum (which holds difficulty at 5+ instead of 3.8) —
        # difficulty-holding without the overspeed-precision trap.
        ("terrain_track5", "humanoid_ppo_terrain", 6000, _save200, 60.0,
         None,
         dict(terrain_gate=True, terrain_cmd=(0.3, 0.0, 0.0),
              env_mut=_attractor_terrain)),
    ]
    # rows whose checkpoints get the second (terrain-MJCF) verdict stream.
    # trimesh_pgs is NOT gated on terrain: its base generator set (stairs/
    # stones/gaps/pits as vertical faces — the collision-semantics
    # exerciser) deliberately keeps reference parity and does not contain
    # the uneven.png spectrum; the terrain-capability claim is carried by
    # terrain_uneven.
    terrain_rows = {"terrain_pgs"}
    pending = []
    for row in agenda:
        tag, task, iters, mut, gate_s, seed = row[:6]
        kw = dict(row[6]) if len(row) > 6 else {}
        if only and tag not in only:
            continue
        kw.setdefault("terrain_gate", tag in terrain_rows)
        _, finish = run_one(tag, task, iters, mut, gate_s, seed=seed,
                            defer_gate=True, **kw)
        pending.append(finish)
    results = [finish() for finish in pending]
    print(json.dumps(results, indent=1))


def _sym_loss(t):
    import dataclasses as _dc

    return t.replace(
        algorithm=_dc.replace(t.algorithm, sym_loss=True, sym_coef=1.0)
    )


def _sym_save200(t):
    import dataclasses as _dc

    t = _sym_loss(t)
    return t.replace(
        runner=_dc.replace(t.runner, save_interval=200)
    )


def _sharp_tracking(cfg):
    import dataclasses as _dc

    return cfg.replace(
        rewards=_dc.replace(cfg.rewards, tracking_sigma=12.0)
    )


def _warm6_freeze(cfg):
    """The round-4 experimental solver: frozen prep + 6 warm sweeps."""
    import dataclasses as _dc

    return cfg.replace(
        sim=_dc.replace(cfg.sim, pgs_iterations=6, pgs_freeze_prep=True,
                        pgs_warm_start=True)
    )


def _freeze_prep_only(cfg):
    """Frozen prep, cold 8 sweeps (ingredient isolation)."""
    import dataclasses as _dc

    return cfg.replace(sim=_dc.replace(cfg.sim, pgs_freeze_prep=True))


def _explore_levels(cfg):
    """30% exploration tier over curriculum difficulty rows."""
    import dataclasses as _dc

    return cfg.replace(
        terrain=_dc.replace(cfg.terrain, random_level_frac=0.3)
    )


def _init_all_levels(cfg):
    """Spawn envs across ALL curriculum difficulty rows at init (the
    reference caps at 5/10, legged_robot_config.py terrain defaults).
    Valid rows are 0..num_rows-1 = 0..9 and init draws
    randint(0, max_init+1), so 9 covers every row (ADVICE r4 #3: 10
    made ~1/11 of envs sample a nonexistent row that gather-clamps to
    row 9, double-weighting it)."""
    import dataclasses as _dc

    return cfg.replace(
        terrain=_dc.replace(cfg.terrain, max_init_terrain_level=9)
    )


def _granule32(t):
    import dataclasses as _dc

    return t.replace(
        algorithm=_dc.replace(t.algorithm, shuffle_granule=32)
    )


def _granule64(t):
    import dataclasses as _dc

    return t.replace(
        algorithm=_dc.replace(t.algorithm, shuffle_granule=64)
    )


def _pgs6(cfg):
    import dataclasses as _dc

    return cfg.replace(sim=_dc.replace(cfg.sim, pgs_iterations=6))


def _pgs4(cfg):
    import dataclasses as _dc

    return cfg.replace(sim=_dc.replace(cfg.sim, pgs_iterations=4))


def _envelope_fixes(cfg):
    """The round-5 envelope ingredients on the 18-dof task: axis-pure
    command practice, directional low-speed floor, sharper tracking."""
    import dataclasses as _dc

    return cfg.replace(
        commands=_dc.replace(cfg.commands, axis_frac=0.25),
        rewards=_dc.replace(
            cfg.rewards, tracking_sigma=12.0, low_speed_lo=0.7,
            low_speed_directional=True,
            scales=_dc.replace(cfg.rewards.scales, tracking_lin_vel=2.4,
                               low_speed=0.4),
        ),
    )


def _envelope_omni(cfg):
    """Envelope fixes + the omni command box (matrix commands interior)."""
    import dataclasses as _dc

    cfg = _envelope_fixes(cfg)
    return cfg.replace(
        commands=_dc.replace(
            cfg.commands,
            ranges=_dc.replace(cfg.commands.ranges,
                               lin_vel_x=(-0.5, 0.6),
                               lin_vel_y=(-0.4, 0.4)),
        )
    )


def _oracle_terrain(cfg):
    """Precise-speed recipe + oracle-intensity uneven majority."""
    import dataclasses as _dc

    cfg = _precise_terrain(cfg)
    return cfg.replace(
        terrain=_dc.replace(
            cfg.terrain,
            uneven_amplitude=0.35,
            terrain_proportions=(0.05, 0.1, 0.1, 0.05, 0.05,
                                 0.05, 0.05, 0.55),
        )
    )


def _precise_terrain(cfg):
    """Overspeed strictly penalized + stricter promotion bar."""
    import dataclasses as _dc

    return cfg.replace(
        rewards=_dc.replace(cfg.rewards, low_speed_overspeed_r=-1.0),
        terrain=_dc.replace(cfg.terrain, promote_quality=0.7),
    )


def _envelope_omni_yaw(cfg):
    """d12_r5b's working recipe (envelope fixes + omni box) + yaw margin:
    the matrix turn command (0.3 rad/s) sits on the ang_vel_yaw box edge,
    so widen practice to +-0.4 and double the yaw-tracking weight."""
    import dataclasses as _dc

    cfg = _envelope_omni(cfg)
    return cfg.replace(
        commands=_dc.replace(
            cfg.commands,
            ranges=_dc.replace(cfg.commands.ranges,
                               ang_vel_yaw=(-0.4, 0.4)),
        ),
        rewards=_dc.replace(
            cfg.rewards,
            scales=_dc.replace(cfg.rewards.scales, tracking_ang_vel=2.2),
        ),
    )


def _trimesh_oracle_mix(cfg):
    """Rebalance the trimesh base set toward the oracle's step features:
    slope 10% / rough 20% / stairs 30% / discrete 25% / stones 5% /
    gap 5% / pit 5% (was 15/15/30/15/10/10/10-remainder)."""
    import dataclasses as _dc

    return cfg.replace(
        terrain=_dc.replace(
            cfg.terrain,
            terrain_proportions=(0.1, 0.2, 0.15, 0.15, 0.25, 0.05, 0.05),
        )
    )


def _attractor_terrain(cfg):
    """terrain_mix's sigma-5 reward shape (the surviving-0.35 m/s
    attractor, 15/28 standing best) on top of the tracking-verdict
    curriculum: undo the round-5 precision ingredients (sigma 12,
    directional band) that lock terrain replays at a falling ~0.4 m/s,
    keep the difficulty-holding promote rule (quality bar scored by the
    gentler sigma-5 curve, so keep the stricter 0.7 bar)."""
    import dataclasses as _dc

    return cfg.replace(
        rewards=_dc.replace(
            cfg.rewards,
            tracking_sigma=5.0,
            low_speed_directional=False,
            low_speed_lo=0.5,
            scales=_dc.replace(cfg.rewards.scales, tracking_lin_vel=2.4,
                               low_speed=0.2),
        ),
        terrain=_dc.replace(cfg.terrain, promote_quality=0.7),
    )


def _terrain_dr(cfg):
    """Extended DR (the transfer recipe's robustness axis) on the terrain
    task: link mass/COM/inertia + motor randomization + action lag."""
    from humanoid_tpu.config.structs import DomainRandCfg

    return cfg.replace(
        domain_rand=DomainRandCfg(
            randomize_link_mass=True,
            randomize_base_com=True,
            randomize_inertia=True,
            randomize_motor_strength=True,
            randomize_motor_offset=True,
            randomize_kp_factor=True,
            randomize_kd_factor=True,
            randomize_lag_timesteps=True,
        )
    )


if __name__ == "__main__":
    main()
