"""Floating-base rigid-body dynamics: mass matrix + bias forces.

TPU-first formulation: instead of a sequential articulated-body recursion,
the mass matrix and bias are assembled as dense einsum contractions over the
stacked body Jacobians,

    M = sum_b J_b^T I_b J_b          (CRBA, world/Plücker-at-base frame)
    C = sum_b J_b^T (I_b a_b + v_b ×* I_b v_b)   (RNEA forward pass only)

which XLA fuses into a handful of batched matmuls over the env axis — the
layout the MXU/VPU want (SURVEY.md §7 "hard parts" #3). Replaces the
reference's closed-source PhysX step (gym.simulate,
/root/reference/humanoid/envs/custom/humanoid_env.py:645).

Generalized coordinates:
  q   = (base_pos (3), base_quat wxyz (4), qj (nj,))
  u   = [omega_base_world (3), v_base_world (3), qdot (nj,)]
Accelerations returned are *conventional* time derivatives of u (the spatial
-> conventional correction omega × v is applied on the linear part), so a
semi-implicit Euler update of u is exact to first order.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .kinematics import body_velocities, fk, jacobians, spatial_inertias
from .model import RobotModel
from .spatial import crf, crm


class DynamicsCache(NamedTuple):
    body_pos: jnp.ndarray   # (nb,3)
    body_quat: jnp.ndarray  # (nb,4)
    J: jnp.ndarray          # (nb,6,nv)
    M: jnp.ndarray          # (nv,nv)
    C: jnp.ndarray          # (nv,) bias incl. gravity
    v_sp: jnp.ndarray       # (nb,6) spatial body velocities


def compute_dynamics(
    model: RobotModel,
    base_pos,
    base_quat,
    qj,
    u,
    mass: Optional[jnp.ndarray] = None,
) -> DynamicsCache:
    body_pos, body_quat = fk(model, base_pos, base_quat, qj)
    J = jacobians(model, body_pos, body_quat)
    I_sp, _ = spatial_inertias(model, body_pos, body_quat, mass)

    # M = sum_b J_b^T I_b J_b  (+ armature on the joint diagonal)
    M = jnp.einsum("bki,bkl,blj->ij", J, I_sp, J)
    arm = jnp.concatenate(
        [jnp.zeros(6), jnp.asarray(model.dof_armature)]
    )
    M = M + jnp.diag(arm)

    # bias: forward pass with qddot = 0 and the gravity trick
    # a_base = [0; -g] => C includes gravity.
    v_sp, w_axes = body_velocities(model, body_pos, body_quat, u)
    A = body_pos[0]
    g = jnp.array([0.0, 0.0, model.gravity])
    a = [jnp.concatenate([jnp.zeros(3), -g])]
    for k in range(model.nj):
        p = int(model.parent[k + 1])
        anchor = body_pos[k + 1] - A
        S = jnp.concatenate([w_axes[k], jnp.cross(anchor, w_axes[k])])
        vJ = S * u[6 + k]
        a.append(a[p] + crm(v_sp[k + 1]) @ vJ)
    a_sp = jnp.stack(a)  # (nb,6)

    Iv = jnp.einsum("bij,bj->bi", I_sp, v_sp)
    f = jnp.einsum("bij,bj->bi", I_sp, a_sp) + jnp.einsum(
        "bij,bj->bi", crf(v_sp), Iv
    )
    C = jnp.einsum("bij,bi->j", J, f)
    # URDF joint damping as part of the bias
    C = C + jnp.concatenate(
        [jnp.zeros(6), jnp.asarray(model.dof_damping) * u[6:]]
    )
    return DynamicsCache(body_pos, body_quat, J, M, C, v_sp)


def forward_accel(cache: DynamicsCache, tau_gen, u):
    """Solve M udot_sp = tau_gen - C; return conventional udot.

    tau_gen: (nv,) generalized forces (joint torques in [6:], plus any
    J^T-mapped external/contact forces).
    """
    from jax.scipy.linalg import cho_solve

    rhs = tau_gen - cache.C
    L = jnp.linalg.cholesky(cache.M)
    udot = cho_solve((L, True), rhs)
    # spatial -> conventional acceleration of the base origin point
    omega = u[0:3]
    v = u[3:6]
    lin = udot[3:6] + jnp.cross(omega, v)
    return jnp.concatenate([udot[0:3], lin, udot[6:]])
