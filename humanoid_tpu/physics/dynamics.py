"""Floating-base rigid-body dynamics: mass matrix + bias forces.

TPU-first CRBA/RNEA formulation. Instead of per-body J^T I J chains (13
small einsums that map terribly onto the MXU/VPU — measured ~6 ms at 4096
envs), the mass matrix is assembled from joint screws and composite
inertias:

    M[i, j] = S_i . (IC_{deeper(i,j)} S_j)        (CRBA)

with ONE batched (nv,6)x(6,nv) contraction plus a static ancestry mask, and
the bias via a subtree force accumulation

    C[i]    = S_i . g_{body(i)},   g_b = sum_{subtree(b)} (I a_b + v x* I v)

Replaces the reference's closed-source PhysX step (gym.simulate,
/root/reference/humanoid/envs/custom/humanoid_env.py:645).

Generalized coordinates:
  q   = (base_pos (3), base_quat wxyz (4), qj (nj,))
  u   = [omega_base_world (3), v_base_world (3), qdot (nj,)]
All spatial quantities live in a world-aligned Plücker frame at the base
origin ("A = p0"), making the base's 6 unit screws trivial. Accelerations
returned are *conventional* derivatives of u (the spatial->conventional
correction omega x v is applied to the linear part).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .kinematics import fk
from .model import RobotModel
from .spatial import quat_rotate, quat_to_mat, skew


class DynamicsCache(NamedTuple):
    body_pos: jnp.ndarray   # (nb,3)
    body_quat: jnp.ndarray  # (nb,4)
    M: jnp.ndarray          # (nv,nv)
    C: jnp.ndarray          # (nv,) bias incl. gravity
    v_sp: jnp.ndarray       # (nb,6) spatial body velocities


_DOF_MASK_CACHE: dict = {}


def _dof_masks(model: RobotModel):
    """Static ancestry mask (numpy constant baked into the graph); cached by
    model identity (RobotModel holds unhashable numpy arrays)."""
    hit = _DOF_MASK_CACHE.get(id(model))
    if hit is not None:
        return jnp.asarray(hit)
    nv, nj, nb = model.nv, model.nj, model.nj + 1
    anc = model.ancestor_matrix()          # (nb, nj): joint j on path to b
    D = np.zeros((nv, nv))
    D[:6, :] = 1.0                         # base dofs precede everything
    # within the mutually-coupled base block keep one triangle only, or the
    # U + U^T symmetrization double-counts it
    D[:6, :6] = np.triu(np.ones((6, 6)))
    for a in range(nj):
        for b in range(nj):
            if anc[b + 1, a]:
                D[6 + a, 6 + b] = 1.0      # joint a is ancestor-or-self of b
    _DOF_MASK_CACHE[id(model)] = D
    return jnp.asarray(D)


def compute_kinematics_bias(
    model: RobotModel,
    base_pos,
    base_quat,
    qj,
    u,
    mass: Optional[jnp.ndarray] = None,
    com: Optional[jnp.ndarray] = None,
    inertia: Optional[jnp.ndarray] = None,
):
    """Everything except the mass matrix: FK, joint screws, per-body
    spatial inertias, the velocity/bias recursion. Split out so the engine
    can freeze the (slowly-varying) mass-matrix factor across PD substeps
    while recomputing contact kinematics and bias forces every substep.

    Returns (body_pos, body_quat, S, I_sp, v_sp, C)."""
    nj, nb, nv = model.nj, model.nj + 1, model.nv
    body_pos, body_quat = fk(model, base_pos, base_quat, qj)
    A = body_pos[0]

    # ---- joint screws in the Plücker-at-base frame ----
    w = quat_rotate(body_quat[1:], jnp.asarray(model.joint_axis))   # (nj,3)
    anchors = body_pos[1:] - A                                       # (nj,3)
    S_j = jnp.concatenate([w, jnp.cross(anchors, w)], axis=-1)       # (nj,6)
    S = jnp.concatenate([jnp.eye(6, dtype=S_j.dtype), S_j], axis=0)  # (nv,6)

    # ---- per-body spatial inertias (vectorized over bodies) ----
    # mass/com/inertia overrides carry the per-env domain randomization
    # (legged_robot.py:313-367: base mass/COM, link mass and inertia factors)
    if mass is None:
        mass = jnp.asarray(model.mass)
    if com is None:
        com = jnp.asarray(model.com)
    if inertia is None:
        inertia = jnp.asarray(model.inertia)
    R = quat_to_mat(body_quat)                                       # (nb,3,3)
    com_w = body_pos + jnp.einsum("bij,bj->bi", R, com)
    I_w = jnp.einsum("bij,bjk,blk->bil", R, inertia, R)
    r = com_w - A
    rx = skew(r)                                                     # (nb,3,3)
    m3 = mass[:, None, None]
    top = jnp.concatenate(
        [I_w + m3 * rx @ jnp.swapaxes(rx, -1, -2), m3 * rx], axis=-1
    )
    bot = jnp.concatenate(
        [m3 * jnp.swapaxes(rx, -1, -2),
         m3 * jnp.broadcast_to(jnp.eye(3), rx.shape)], axis=-1
    )
    I_sp = jnp.concatenate([top, bot], axis=-2)                      # (nb,6,6)

    # ---- bias: velocity + bias-acceleration passes, subtree force sum ----
    v = [jnp.concatenate([u[0:3], u[3:6]])]
    g_vec = jnp.array([0.0, 0.0, model.gravity])
    a = [jnp.concatenate([jnp.zeros(3), -g_vec])]                    # gravity trick
    for k in range(nj):
        p = int(model.parent[k + 1])
        vJ = S_j[k] * u[6 + k]
        vb = v[p] + vJ
        v.append(vb)
        # crm(v_b) @ vJ with explicit 3-crosses
        aw = jnp.cross(vb[0:3], vJ[0:3])
        al = jnp.cross(vb[3:6], vJ[0:3]) + jnp.cross(vb[0:3], vJ[3:6])
        a.append(a[p] + jnp.concatenate([aw, al]))
    v_sp = jnp.stack(v)                                              # (nb,6)
    a_sp = jnp.stack(a)

    Iv = jnp.einsum("bij,bj->bi", I_sp, v_sp)
    Ia = jnp.einsum("bij,bj->bi", I_sp, a_sp)
    # crf(v) @ Iv = [w x n + vl x f ; w x f]
    n_, f_ = Iv[:, 0:3], Iv[:, 3:6]
    wv, vl = v_sp[:, 0:3], v_sp[:, 3:6]
    f_b = Ia + jnp.concatenate(
        [jnp.cross(wv, n_) + jnp.cross(vl, f_), jnp.cross(wv, f_)], axis=-1
    )                                                                # (nb,6)

    g = [f_b[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = int(model.parent[b])
        g[p] = g[p] + g[b]
    C_base = g[0]
    C_j = jnp.einsum("vj,vj->v", S_j, jnp.stack(g[1:]))
    C = jnp.concatenate([C_base, C_j])
    C = C + jnp.concatenate(
        [jnp.zeros(6), jnp.asarray(model.dof_damping) * u[6:]]
    )
    return body_pos, body_quat, S, I_sp, v_sp, C


def assemble_mass_matrix(model: RobotModel, S, I_sp):
    """CRBA from joint screws + per-body spatial inertias: composite
    inertias by reverse topological accumulation, M = D∘(S F^T)
    symmetrized, plus reflected armature."""
    nb = model.nj + 1
    IC = [I_sp[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = int(model.parent[b])
        IC[p] = IC[p] + IC[b]
    IC_dof = jnp.stack([IC[0]] * 6 + [IC[b] for b in range(1, nb)])  # (nv,6,6)
    F = jnp.einsum("vij,vj->vi", IC_dof, S)                          # (nv,6)
    U = (S @ F.T) * _dof_masks(model)
    M = U + U.T - jnp.diag(jnp.diag(U))
    arm = jnp.concatenate([jnp.zeros(6), jnp.asarray(model.dof_armature)])
    return M + jnp.diag(arm)


def compute_dynamics(
    model: RobotModel,
    base_pos,
    base_quat,
    qj,
    u,
    mass: Optional[jnp.ndarray] = None,
    com: Optional[jnp.ndarray] = None,
    inertia: Optional[jnp.ndarray] = None,
) -> DynamicsCache:
    body_pos, body_quat, S, I_sp, v_sp, C = compute_kinematics_bias(
        model, base_pos, base_quat, qj, u, mass=mass, com=com,
        inertia=inertia,
    )
    M = assemble_mass_matrix(model, S, I_sp)
    return DynamicsCache(body_pos, body_quat, M, C, v_sp)


def forward_accel(cache: DynamicsCache, tau_gen, u):
    """Solve M udot_sp = tau_gen - C; return conventional udot.

    tau_gen: (nv,) generalized forces (joint torques in [6:], plus any
    J^T-mapped external/contact forces).
    """
    from ..ops.linalg import chol_solve_unrolled

    rhs = tau_gen - cache.C
    udot = chol_solve_unrolled(cache.M, rhs)
    # spatial -> conventional acceleration of the base origin point
    omega = u[0:3]
    v = u[3:6]
    lin = udot[3:6] + jnp.cross(omega, v)
    return jnp.concatenate([udot[0:3], lin, udot[6:]])
