"""Batched forward kinematics and geometric Jacobians.

Everything is written single-robot over (nj,) joint vectors and vmapped over
the env axis by the engine; the per-body loops are unrolled Python loops over
a static topology, so XLA sees a flat fused graph (no data-dependent control
flow, SURVEY.md §7).

Frames: world-aligned Plücker frame with origin at the base position
("A = p0"), which makes the floating-base columns of every Jacobian the
trivial unit screws and keeps moments numerically small (see dynamics.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from .model import RobotModel
from .spatial import quat_from_axis_angle, quat_mul, quat_rotate, quat_to_mat, mat_to_quat


def fk(model: RobotModel, base_pos, base_quat, qj):
    """Forward kinematics.

    Returns body_pos (nb,3) world positions of body frames and body_quat
    (nb,4) world orientations.
    """
    jr_quat = [mat_to_quat(jnp.asarray(model.joint_rot[k])) for k in range(model.nj)]
    pos = [base_pos]
    quat = [base_quat]
    for k in range(model.nj):
        p = int(model.parent[k + 1])
        # parent frame -> joint frame (fixed) -> rotate about axis by q_k
        q_fixed = quat_mul(quat[p], jr_quat[k])
        q_joint = quat_from_axis_angle(jnp.asarray(model.joint_axis[k]), qj[k])
        quat.append(quat_mul(q_fixed, q_joint))
        pos.append(pos[p] + quat_rotate(quat[p], jnp.asarray(model.joint_pos[k])))
    return jnp.stack(pos), jnp.stack(quat)


def body_velocities(model: RobotModel, body_pos, body_quat, u):
    """Spatial velocity [omega; v_A] of every body in the Plücker-at-base
    frame, plus per-joint world axes and anchors.

    u: (nv,) = [omega_base_world(3), v_base_world(3), qdot(nj)].

    Returns (v_sp (nb,6), w_axis (nj,3) world joint axes, anchors (nj,3)).
    """
    A = body_pos[0]
    w_axes = []
    v_sp = [jnp.concatenate([u[0:3], u[3:6]])]
    for k in range(model.nj):
        p = int(model.parent[k + 1])
        w = quat_rotate(body_quat[k + 1], jnp.asarray(model.joint_axis[k]))
        w_axes.append(w)
        anchor = body_pos[k + 1] - A
        S = jnp.concatenate([w, jnp.cross(anchor, w)])
        v_sp.append(v_sp[p] + S * u[6 + k])
    return jnp.stack(v_sp), jnp.stack(w_axes)


def jacobians(model: RobotModel, body_pos, body_quat):
    """Geometric Jacobians J (nb, 6, nv) in the Plücker-at-base frame.

    Row body b, column c: spatial unit twist of dof c as felt by body b.
    Base columns are [I;0],[0;I] by construction of the frame.
    """
    A = body_pos[0]
    anc = jnp.asarray(model.ancestor_matrix())  # (nb, nj) static 0/1
    # world axes and anchors per joint
    w = jnp.stack(
        [
            quat_rotate(body_quat[k + 1], jnp.asarray(model.joint_axis[k]))
            for k in range(model.nj)
        ]
    )  # (nj,3)
    anchors = body_pos[1:] - A  # (nj,3) joint k anchored at body k+1 origin
    S_ang = w  # (nj,3)
    S_lin = jnp.cross(anchors, w)  # (nj,3)
    # joint columns masked by ancestry
    Jj = jnp.concatenate([S_ang, S_lin], axis=-1)  # (nj,6)
    J_joint = anc[:, :, None] * Jj[None, :, :]  # (nb, nj, 6)
    J_joint = jnp.swapaxes(J_joint, 1, 2)  # (nb, 6, nj)
    base_block = jnp.broadcast_to(jnp.eye(6), (model.nb, 6, 6))
    return jnp.concatenate([base_block, J_joint], axis=-1)  # (nb,6,nv)


def spatial_inertias(model: RobotModel, body_pos, body_quat, mass=None):
    """Per-body 6x6 spatial inertias in the Plücker-at-base frame.

    mass: optional (nb,) per-env override (domain-randomized base mass,
    reference humanoid_env.py:560-570); defaults to the model's masses.
    """
    from .spatial import spatial_inertia_at

    A = body_pos[0]
    if mass is None:
        mass = jnp.asarray(model.mass)
    R = quat_to_mat(body_quat)  # (nb,3,3)
    com_w = body_pos + jnp.einsum("bij,bj->bi", R, jnp.asarray(model.com))
    I_w = jnp.einsum("bij,bjk,blk->bil", R, jnp.asarray(model.inertia), R)
    I_sp = []
    for b in range(model.nb):
        I_sp.append(spatial_inertia_at(mass[b], com_w[b], I_w[b], A))
    return jnp.stack(I_sp), com_w
