"""The XBot-L reward bank: 22 active terms, batched over envs.

Each term reproduces the corresponding `_reward_*` method of the reference
(/root/reference/humanoid/envs/custom/humanoid_env.py:1170-1437, 12-dof
index layout) as a pure function of a RewardContext. The step pipeline
builds one context per control step; terms with zero scale are pruned at
table-build time (reference humanoid_env.py:207-210).

Stateful gait bookkeeping (feet air time, feet height integration) is pulled
out of the reward functions into explicit context fields + `gait_updates`,
since pure functions can't mutate env state the way the reference methods do.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RewardContext(NamedTuple):
    """Everything the reward bank reads. All arrays lead with the env axis."""
    dof_pos: jnp.ndarray            # (N, nj)
    dof_vel: jnp.ndarray            # (N, nj)
    last_dof_vel: jnp.ndarray       # (N, nj)
    actions: jnp.ndarray            # (N, nj)
    last_actions: jnp.ndarray       # (N, nj)
    last_last_actions: jnp.ndarray  # (N, nj)
    torques: jnp.ndarray            # (N, nj)
    ref_dof_pos: jnp.ndarray        # (N, nj)
    default_dof_pos: jnp.ndarray    # (nj,)
    base_pos: jnp.ndarray           # (N, 3)
    base_lin_vel: jnp.ndarray       # (N, 3) body frame
    base_ang_vel: jnp.ndarray       # (N, 3) body frame
    base_euler: jnp.ndarray         # (N, 3)
    projected_gravity: jnp.ndarray  # (N, 3)
    root_vel: jnp.ndarray           # (N, 6) [lin, ang] world (Isaac layout)
    last_root_vel: jnp.ndarray      # (N, 6)
    commands: jnp.ndarray           # (N, 4)
    foot_pos: jnp.ndarray           # (N, 2, 3) world foot frame positions
    knee_pos: jnp.ndarray           # (N, 2, 3)
    foot_ang_vel: jnp.ndarray       # (N, 2, 3) world angular velocity of feet
    foot_forces: jnp.ndarray        # (N, 2, 3) contact force per foot
    term_force: jnp.ndarray         # (N, nt) normal force on penalized bodies
    contact: jnp.ndarray            # (N, 2) bool, fz > 5 N
    stance_mask: jnp.ndarray        # (N, 2) gait-phase stance mask
    # gait bookkeeping (pre-update values + this step's update results)
    feet_air_time: jnp.ndarray      # (N, 2) after += dt
    first_contact: jnp.ndarray      # (N, 2)
    feet_height: jnp.ndarray        # (N, 2) after integration
    dt: float
    cfg: "RewardsCfg"               # humanoid_tpu.config.structs.RewardsCfg


def gait_updates(
    contact, stance_mask, last_contacts, feet_air_time, foot_pos_z,
    last_feet_z, feet_height, dt,
):
    """The stateful part of feet_air_time / feet_clearance
    (humanoid_env.py:1222-1231, 1349-1366) as explicit transitions.

    Returns (ctx_fields, new_state_fields).
    """
    contact_filt = contact | stance_mask.astype(bool) | last_contacts
    first_contact = (feet_air_time > 0.0) & contact_filt
    air_time = feet_air_time + dt
    new_feet_air_time = air_time * (~contact_filt)

    feet_z = foot_pos_z - 0.05
    delta_z = feet_z - last_feet_z
    fh = feet_height + delta_z
    new_feet_height = fh * (~contact)
    return (air_time, first_contact, fh), (
        new_feet_air_time, contact, feet_z, new_feet_height
    )


# ---------------------------------------------------------------------------
# reward terms (names match the reference scale table)
# ---------------------------------------------------------------------------

def joint_pos(c: RewardContext):
    diff = c.dof_pos - c.ref_dof_pos
    n = jnp.linalg.norm(diff, axis=1)
    return jnp.exp(-2.0 * n) - 0.2 * jnp.clip(n, 0.0, 0.5)


def feet_distance(c: RewardContext):
    fd = jnp.linalg.norm(
        c.foot_pos[:, 0, 0:2] - c.foot_pos[:, 1, 0:2], axis=1
    )
    d_min = jnp.clip(fd - c.cfg.min_dist, -0.5, 0.0)
    d_max = jnp.clip(fd - c.cfg.max_dist, 0.0, 0.5)
    return (
        jnp.exp(-jnp.abs(d_min) * 100) + jnp.exp(-jnp.abs(d_max) * 100)
    ) / 2.0


def knee_distance(c: RewardContext):
    kd = jnp.linalg.norm(
        c.knee_pos[:, 0, 0:2] - c.knee_pos[:, 1, 0:2], axis=1
    )
    d_min = jnp.clip(kd - c.cfg.min_dist, -0.5, 0.0)
    d_max = jnp.clip(kd - c.cfg.max_dist / 2, 0.0, 0.5)
    return (
        jnp.exp(-jnp.abs(d_min) * 100) + jnp.exp(-jnp.abs(d_max) * 100)
    ) / 2.0


def foot_slip(c: RewardContext):
    # the reference reads rigid_state[..., 10:12] — the feet's *angular*
    # velocity xy (an upstream quirk kept for parity): penalizes foot rocking
    # while in contact.
    speed = jnp.linalg.norm(c.foot_ang_vel[:, :, 0:2], axis=2)
    return jnp.sum(jnp.sqrt(speed) * c.contact, axis=1)


def feet_air_time(c: RewardContext):
    return jnp.sum(
        jnp.clip(c.feet_air_time, 0.0, 0.5) * c.first_contact, axis=1
    )


def feet_contact_number(c: RewardContext):
    match = c.contact == c.stance_mask.astype(bool)
    return jnp.mean(jnp.where(match, 1.0, -0.3), axis=1)


def orientation(c: RewardContext):
    quat_mismatch = jnp.exp(
        -jnp.sum(jnp.abs(c.base_euler[:, 0:2]), axis=1) * 10
    )
    orient = jnp.exp(
        -jnp.linalg.norm(c.projected_gravity[:, 0:2], axis=1) * 20
    )
    return (quat_mismatch + orient) / 2.0


def feet_contact_forces(c: RewardContext):
    f = jnp.linalg.norm(c.foot_forces, axis=-1)
    return jnp.sum(
        jnp.clip(f - c.cfg.max_contact_force, 0.0, 400.0), axis=1
    )


def default_joint_pos(c: RewardContext):
    joint_diff = c.dof_pos - c.default_dof_pos
    left_yaw_roll = joint_diff[:, 0:2]
    right_yaw_roll = joint_diff[:, 6:8]
    yaw_roll = jnp.linalg.norm(left_yaw_roll, axis=1) + jnp.linalg.norm(
        right_yaw_roll, axis=1
    )
    yaw_roll = jnp.clip(yaw_roll - 0.1, 0.0, 50.0)
    return jnp.exp(-yaw_roll * 100) - 0.01 * jnp.linalg.norm(
        joint_diff, axis=1
    )


def base_height(c: RewardContext):
    stance = c.stance_mask
    measured = jnp.sum(c.foot_pos[:, :, 2] * stance, axis=1) / jnp.maximum(
        jnp.sum(stance, axis=1), 1e-6
    )
    h = c.base_pos[:, 2] - (measured - 0.05)
    return jnp.exp(-jnp.abs(h - c.cfg.base_height_target) * 100)


def base_acc(c: RewardContext):
    root_acc = c.last_root_vel - c.root_vel
    return jnp.exp(-jnp.linalg.norm(root_acc, axis=1) * 3)


def vel_mismatch_exp(c: RewardContext):
    lin = jnp.exp(-jnp.square(c.base_lin_vel[:, 2]) * 10)
    ang = jnp.exp(-jnp.linalg.norm(c.base_ang_vel[:, 0:2], axis=1) * 5.0)
    return (lin + ang) / 2.0


def track_vel_hard(c: RewardContext):
    lin_err = jnp.linalg.norm(
        c.commands[:, 0:2] - c.base_lin_vel[:, 0:2], axis=1
    )
    ang_err = jnp.abs(c.commands[:, 2] - c.base_ang_vel[:, 2])
    return (
        jnp.exp(-lin_err * 10) + jnp.exp(-ang_err * 10)
    ) / 2.0 - 0.2 * (lin_err + ang_err)


def tracking_lin_vel(c: RewardContext):
    err = jnp.sum(
        jnp.square(c.commands[:, 0:2] - c.base_lin_vel[:, 0:2]), axis=1
    )
    return jnp.exp(-err * c.cfg.tracking_sigma)


def tracking_ang_vel(c: RewardContext):
    err = jnp.square(c.commands[:, 2] - c.base_ang_vel[:, 2])
    return jnp.exp(-err * c.cfg.tracking_sigma)


def feet_clearance(c: RewardContext):
    swing = 1.0 - c.stance_mask
    near = jnp.abs(c.feet_height - c.cfg.target_feet_height) < 0.01
    return jnp.sum(near * swing, axis=1)


def low_speed(c: RewardContext):
    if c.cfg.low_speed_directional:
        # round-5 extension (RewardsCfg.low_speed_directional): the
        # reference term polices only |vx| (humanoid_env.py:1393-1407),
        # so lateral/backward commands have NO speed floor — measured as
        # uniform ~0.67x undertracking of every 0.3 m/s non-forward gate
        # cell (validation/envelope_r5). Project onto the commanded
        # direction instead: the band check becomes exactly the
        # deployment gate's v_along >= lo * ||cmd|| criterion, for every
        # direction.
        cmd_xy = c.commands[:, 0:2]
        cmd = jnp.linalg.norm(cmd_xy, axis=1)
        dirv = cmd_xy / jnp.maximum(cmd, 1e-6)[:, None]
        signed = jnp.sum(c.base_lin_vel[:, 0:2] * dirv, axis=1)
        speed = jnp.abs(signed)
        mismatch = signed < 0.0
        active = cmd > 0.1
    else:
        speed = jnp.abs(c.base_lin_vel[:, 0])
        cmd = jnp.abs(c.commands[:, 0])
        mismatch = (
            jnp.sign(c.base_lin_vel[:, 0]) != jnp.sign(c.commands[:, 0])
        )
        active = cmd > 0.1
    too_low = speed < c.cfg.low_speed_lo * cmd
    too_high = speed > c.cfg.low_speed_hi * cmd
    desired = ~(too_low | too_high)
    r = jnp.zeros_like(speed)
    r = jnp.where(too_low, -1.0, r)
    r = jnp.where(too_high, c.cfg.low_speed_overspeed_r, r)
    r = jnp.where(desired, 1.2, r)
    r = jnp.where(mismatch, -2.0, r)
    return r * active


def torques(c: RewardContext):
    return jnp.sum(jnp.square(c.torques), axis=1)


def dof_vel(c: RewardContext):
    return jnp.sum(jnp.square(c.dof_vel), axis=1)


def dof_acc(c: RewardContext):
    return jnp.sum(
        jnp.square((c.last_dof_vel - c.dof_vel) / c.dt), axis=1
    )


def collision(c: RewardContext):
    return jnp.sum(1.0 * (c.term_force > 0.1), axis=1)


def action_smoothness(c: RewardContext):
    t1 = jnp.sum(jnp.square(c.last_actions - c.actions), axis=1)
    t2 = jnp.sum(
        jnp.square(c.actions + c.last_last_actions - 2 * c.last_actions),
        axis=1,
    )
    t3 = 0.05 * jnp.sum(jnp.abs(c.actions), axis=1)
    return t1 + t2 + t3


REWARD_FNS = {
    "joint_pos": joint_pos,
    "feet_distance": feet_distance,
    "knee_distance": knee_distance,
    "foot_slip": foot_slip,
    "feet_air_time": feet_air_time,
    "feet_contact_number": feet_contact_number,
    "orientation": orientation,
    "feet_contact_forces": feet_contact_forces,
    "default_joint_pos": default_joint_pos,
    "base_height": base_height,
    "base_acc": base_acc,
    "vel_mismatch_exp": vel_mismatch_exp,
    "track_vel_hard": track_vel_hard,
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "feet_clearance": feet_clearance,
    "low_speed": low_speed,
    "torques": torques,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "collision": collision,
    "action_smoothness": action_smoothness,
}


def build_reward_table(rewards_cfg, dt: float):
    """(names, fns, scales*dt) for nonzero-scale terms the bank implements
    (zero scales pruned; scale x dt matches humanoid_env.py:211-212)."""
    names, fns, scales = [], [], []
    for name, scale in rewards_cfg.scales.active():
        if name not in REWARD_FNS:
            continue  # termination/stumble/action_rate/stand_still are 0 anyway
        names.append(name)
        fns.append(REWARD_FNS[name])
        scales.append(scale * dt)
    return tuple(names), tuple(fns), tuple(scales)
