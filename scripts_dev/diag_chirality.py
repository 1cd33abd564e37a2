"""Isolate the chiral lateral-tracking failure (VERDICT r4 next #1).

The committed matrices show a side-dependent lateral failure that flips
with recipe (flagship_freeze8 fails lateral_LEFT, omni/omni_sym fail
lateral_RIGHT). Two hypotheses:

  (a) the PLANT is asymmetric — the reference MJCF's merged-link
      inertias differ left/right, so even a perfectly mirror-symmetric
      policy tracks one side worse;
  (b) the POLICY is asymmetric — training converged to a chiral gait
      (command sampling rarely visits pure-lateral commands at the box
      edge, so nothing pulls the two sides together).

Discriminating experiment: build the mirrored policy
    pi_M(o) = M_act( pi( M_obs(o) ) )
from the validated signed-permutation spec (algo/symmetry.py — the same
matrices the sym loss uses). If the MuJoCo plant were exactly symmetric,
rolling out pi_M under lateral_left would reproduce (mirrored) exactly
what pi does under lateral_right. So:

  plant asymmetry  = |v_along(pi_M, left) - v_along(pi, right)|
  policy asymmetry = |v_along(pi,  left) - v_along(pi,  right)|

Also prints the static mirror residual E|M_act pi(M_obs o) - pi(o)| over
recorded rollout observations, and a left/right mass/CoM audit of the
MJCF itself.

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts_dev/diag_chirality.py \
      --load-model validation/omni_sym/policy_3001.npz --task humanoid_ppo_omni
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def mirrored_policy(policy, frame_stack=15, nj=12):
    from humanoid_tpu.algo.symmetry import xbot_perm_matrices

    obs_mat, act_mat = xbot_perm_matrices(frame_stack, nj)

    def pi_m(obs):
        a = np.asarray(policy(np.asarray(obs, np.float32) @ obs_mat))
        return a.reshape(-1) @ act_mat

    return pi_m


def lateral_cell(side: str, duration=20.0):
    from humanoid_tpu.deploy.gate_matrix import GateCell

    vy = 0.3 if side == "left" else -0.3
    return GateCell(f"lateral_{side}", duration,
                    ((0.0, (0.0, vy, 0.0)),))


def run_cell(policy, cfg, cell):
    from humanoid_tpu.deploy.gate_matrix import judge_cell
    from humanoid_tpu.deploy.sim2sim import run_mujoco

    import copy

    cfg_c = copy.copy(cfg)
    cfg_c.sim_duration = cell.duration
    dt_policy = cfg.dt * cfg.decimation
    metrics = run_mujoco(
        policy, cfg_c, command=cell.schedule[0][1],
        heading_hold=True, record_states=True,
    )
    states = metrics.pop("states")
    rec = judge_cell(cell, metrics, states, dt_policy)
    seg = rec.get("segments", [{}])
    v_along = seg[0].get("v_along") if seg else None
    return rec, v_along


def audit_mjcf(path):
    """Left/right mass + CoM-mirror deltas of the oracle model."""
    import mujoco

    model = mujoco.MjModel.from_xml_path(path)
    rows = []
    for b in range(model.nbody):
        name = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, b) or ""
        if name.startswith("left"):
            rname = "right" + name[4:]
            rb = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, rname)
            if rb < 0:
                continue
            dm = float(model.body_mass[b] - model.body_mass[rb])
            # mirror across x-z: y flips
            ipl = model.body_ipos[b].copy()
            ipr = model.body_ipos[rb].copy()
            ipr[1] *= -1
            dc = ipl - ipr
            di = model.body_inertia[b] - model.body_inertia[rb]
            rows.append((name, dm, float(np.abs(dc).max()),
                         float(np.abs(di).max())))
    print("MJCF left-right audit (dmass kg, |dCoM-mirror| m, |dI| kgm2):")
    tot = 0.0
    for name, dm, dc, di in rows:
        tot += dm
        if abs(dm) > 1e-6 or dc > 1e-6 or di > 1e-6:
            print(f"  {name:34s} {dm:+.4f}  {dc:.5f}  {di:.6f}")
    print(f"  total left-minus-right mass: {tot:+.4f} kg")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--load-model", dest="load_model", required=True)
    p.add_argument("--task", default="humanoid_ppo_omni")
    p.add_argument("--duration", type=float, default=20.0)
    args = p.parse_args()

    from humanoid_tpu.deploy.npz_policy import NpzPolicy
    from humanoid_tpu.deploy.sim2sim import cfg_for_task

    cfg = cfg_for_task(args.task)
    policy = NpzPolicy(args.load_model)
    pi_m = mirrored_policy(policy, cfg.frame_stack, cfg.num_actions)

    audit_mjcf(cfg.mujoco_model_path)

    results = {}
    for name, pol in (("pi", policy), ("pi_M", pi_m)):
        for side in ("left", "right"):
            rec, v_along = run_cell(pol, cfg, lateral_cell(side, args.duration))
            results[(name, side)] = v_along
            print(f"{name} lateral_{side}: v_along={v_along} "
                  f"passed={rec['passed']} ({rec['criterion']})")

    pl = results[("pi", "left")]
    pr = results[("pi", "right")]
    ml = results[("pi_M", "left")]
    mr = results[("pi_M", "right")]
    if None not in (pl, pr, ml, mr):
        print(f"\npolicy asymmetry |pi(L)-pi(R)|           = {abs(pl-pr):.3f}")
        print(f"plant asymmetry  |pi_M(L)-pi(R)|          = {abs(ml-pr):.3f}")
        print(f"plant asymmetry  |pi_M(R)-pi(L)|          = {abs(mr-pl):.3f}")
        print("interpretation: plant~0 & policy>>0 -> learned chiral gait;"
              " plant>>0 -> oracle model asymmetry")


if __name__ == "__main__":
    main()
