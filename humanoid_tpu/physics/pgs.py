"""Constraint-based contact: batched per-env projected Gauss-Seidel solve.

The blueprint's north star (SURVEY.md §7, BASELINE.json: "batched contact
solve as per-env small QP/PGS blocks") — a velocity-stepping complementarity
solve of the class PhysX TGS (reference L0, humanoid_env.py:645) and MuJoCo
both use, replacing the compliant penalty model (contact.py) whose 3-6x
body-weight impact spikes trained bouncy gaits (VALIDATION.md r2).

Formulation (Anitescu/Stewart-Trinkle velocity time-stepping):

    u+ = u_free + M^-1 Jc^T lam,          u_free = u + h M^-1 (tau - C)
    per contact k:  0 <= lam_n  _|_  v_n+ + b_n + gamma*lam_n >= 0
                    ||lam_t|| <= mu * lam_n   (Coulomb cone, exact stick)

with Baumgarte bias b_n = -(erp/h) max(-phi - slop, 0) and a small
constraint-force-mixing regularizer gamma (both mapped from a spring-damper
time constant, MuJoCo solref-style). Solved by block PGS over the contacts:
scalar normal update + 2x2 tangential solve + cone projection, everything
batched over the env axis so each scalar op is an (N,)-lane VPU op.

TPU shape notes: K = 8 foot points, nv = 18 -> the Delassus operator is
(N, 24, 24) built by one batched (24,18)x(18,24) matmul (MXU), and the PGS
sweep is fully unrolled (iterations x K static) into elementwise lane ops.
No gathers: all body indexing is static, as in contact.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .contact import ContactParams, Terrain, _point_forces
from .model import RobotModel
from .spatial import quat_rotate, skew


class PGSParams(NamedTuple):
    """Solver constants. erp/cfm defaults map a 20 ms critically-damped
    contact (MuJoCo's default solref (0.02, 1)) to the velocity level at
    h = 1 ms: erp = h/(h + 2*tau), cfm_ratio = tau^2/(h*(h + 2*tau)) /
    (1/h) ~ A_nn-relative regularization."""
    iterations: int = 8
    erp: float = 0.024
    cfm_ratio: float = 0.01
    slop: float = 0.0
    # in-kernel speed/accuracy trades (see SimCfg.pgs_freeze_prep /
    # pgs_warm_start; freeze_prep ships on registered tasks, warm_start
    # is the measured transfer-breaker and stays OFF). KERNEL-ONLY: the
    # XLA fallback path (engine.substep_batch_pgs) always does per-
    # substep prep with a cold start — on non-TPU backends these flags
    # are no-ops (engine.py emits a warning when they are set).
    freeze_prep: bool = False
    warm_start: bool = False


def _contact_frames(n):
    """Orthonormal tangent basis per contact normal n (..., 3)."""
    # pick the world axis least aligned with n to build t1
    ex = jnp.array([1.0, 0.0, 0.0])
    ey = jnp.array([0.0, 1.0, 0.0])
    use_x = jnp.abs(n[..., 0:1]) < 0.9
    a = jnp.where(use_x, ex, ey)
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


def foot_contact_set(
    model: RobotModel,
    body_pos,      # (N, nb, 3)
    body_quat,     # (N, nb, 4)
    v_sp,          # (N, nb, 6)
    terrain: Terrain,
):
    """Batched foot-point kinematics + Jacobians + terrain geometry.

    Returns (pts (N,K,3), vels (N,K,3), phi (N,K), n (N,K,3),
    J (N,K,3,nv)) with K = 4 corners x n_feet and J mapping the spatial
    generalized velocity u = [omega, v_at_A, qdot] to world point velocity.
    """
    nj = model.nj
    A = body_pos[:, 0]                                      # (N,3)
    pt_body_np, pt_off_np = model.contact_points()
    K = len(pt_body_np)

    pts, vels = [], []
    for b, off in zip(pt_body_np, pt_off_np):
        b = int(b)
        p = body_pos[:, b] + quat_rotate(body_quat[:, b], jnp.asarray(off))
        v = v_sp[:, b, 3:6] + jnp.cross(v_sp[:, b, 0:3], p - A)
        pts.append(p)
        vels.append(v)
    pts = jnp.stack(pts, axis=1)                            # (N,K,3)
    vels = jnp.stack(vels, axis=1)

    # terrain gap + normal (wall-aware on trimesh-mode terrain)
    if terrain.flat:
        heights = jnp.zeros(pts.shape[:-1], dtype=pts.dtype)
        n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pts.shape)
        phi = pts[..., 2]
    else:
        heights, gx, gy = terrain.sample_with_grad(pts[..., 0:2])
        inv_l = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
        n = jnp.stack([-gx * inv_l, -gy * inv_l, inv_l], axis=-1)
        phi = (pts[..., 2] - heights) * inv_l

    # Jacobian: base block [-skew(r) | I3], joint block
    # mask_kj * (anchor_j x w_j + w_j x r_k)  (ancestor mask is a numpy
    # constant — no gathers)
    r = pts - A[:, None]                                    # (N,K,3)
    w_j = quat_rotate(
        body_quat[:, 1:], jnp.asarray(model.joint_axis)
    )                                                       # (N,nj,3)
    anchor = body_pos[:, 1:] - A[:, None]                   # (N,nj,3)
    lin_j = jnp.cross(anchor, w_j)                          # (N,nj,3)
    mask = jnp.asarray(model.ancestor_matrix()[pt_body_np])  # (K,nj) const
    # (N,K,nj,3): per-dof point-velocity columns
    Jj = mask[None, :, :, None] * (
        lin_j[:, None] + jnp.cross(
            w_j[:, None], r[:, :, None, :]
        )
    )
    J_base_w = -skew(r)                                     # (N,K,3,3)
    eye3 = jnp.broadcast_to(jnp.eye(3), J_base_w.shape)
    J = jnp.concatenate(
        [J_base_w, eye3, jnp.swapaxes(Jj, -1, -2)], axis=-1
    )                                                       # (N,K,3,nv)
    return pts, vels, phi, n, J


def pgs_solve(
    u_free,        # (N, nv) spatial free velocity
    L,             # (N, nv, nv) Cholesky of M
    phi,           # (N, K) signed gap along the normal
    n,             # (N, K, 3) contact normals
    J,             # (N, K, 3, nv) point Jacobians (world frame)
    mu,            # (N,) friction coefficient
    dt: float,
    params: PGSParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-PGS impulse solve. Returns (u_plus (N,nv), forces (N,K,3)
    world contact forces = impulses / dt)."""
    from ..ops.linalg import chol_apply_unrolled

    N, K = phi.shape
    nv = u_free.shape[-1]

    # contact-frame rows [n; t1; t2] . J
    t1, t2 = _contact_frames(n)
    Rk = jnp.stack([n, t1, t2], axis=2)                     # (N,K,3,3)
    Jc = jnp.einsum("nkab,nkbv->nkav", Rk, J)               # (N,K,3,nv)
    Jc_flat = Jc.reshape(N, 3 * K, nv)

    # W = M^-1 Jc^T via the cached factor (multi-rhs triangular sweeps),
    # Delassus A = Jc W^T: one batched MXU matmul
    W = chol_apply_unrolled(L[:, None], Jc_flat)            # (N,3K,nv)
    Amat = jnp.einsum("nkv,nlv->nkl", Jc_flat, W)           # (N,3K,3K)
    v_free = jnp.einsum("nkv,nv->nk", Jc_flat, u_free)      # (N,3K)

    active = phi < 0.0                                      # (N,K)
    pen = jnp.maximum(-phi - params.slop, 0.0)
    b_n = -(params.erp / dt) * pen                          # (N,K)

    # block-PGS sweep: lax.fori_loop over iterations (one traced body —
    # keeps the graph small), contacts unrolled inside (static indices)
    def sweep(_, lam):
        for k in range(K):
            i0 = 3 * k
            vk = v_free[:, i0:i0 + 3] + jnp.einsum(
                "nij,nj->ni", Amat[:, i0:i0 + 3, :], lam
            )                                               # (N,3)
            Ann = Amat[:, i0, i0]
            gam = params.cfm_ratio * Ann
            ln = lam[:, i0]
            ln_new = jnp.maximum(
                0.0, ln - (vk[:, 0] + b_n[:, k] + gam * ln) / (Ann + gam)
            )
            ln_new = jnp.where(active[:, k], ln_new, 0.0)
            # tangential 2x2 solve with the normal update applied
            dvt = Amat[:, i0 + 1:i0 + 3, i0] * (ln_new - ln)[:, None]
            vt = vk[:, 1:3] + dvt
            a11 = Amat[:, i0 + 1, i0 + 1] + gam
            a22 = Amat[:, i0 + 2, i0 + 2] + gam
            a12 = Amat[:, i0 + 1, i0 + 2]
            det = a11 * a22 - a12 * a12
            rhs1 = vt[:, 0] + gam * lam[:, i0 + 1]
            rhs2 = vt[:, 1] + gam * lam[:, i0 + 2]
            dl1 = -(a22 * rhs1 - a12 * rhs2) / det
            dl2 = -(a11 * rhs2 - a12 * rhs1) / det
            lt1 = lam[:, i0 + 1] + dl1
            lt2 = lam[:, i0 + 2] + dl2
            # Coulomb cone projection (exact stick inside the cone)
            tnorm = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
            bound = mu * ln_new
            scale = jnp.minimum(1.0, bound / tnorm)
            ok = active[:, k]
            new3 = jnp.stack(
                [ln_new,
                 jnp.where(ok, lt1 * scale, 0.0),
                 jnp.where(ok, lt2 * scale, 0.0)], axis=1
            )
            lam = lam.at[:, i0:i0 + 3].set(new3)
        return lam

    lam = jax.lax.fori_loop(
        0, params.iterations, sweep, jnp.zeros((N, 3 * K), u_free.dtype)
    )

    u_plus = u_free + jnp.einsum("nkv,nk->nv", W, lam)
    # world-frame contact force per point: R^T lam / dt
    lam_k = lam.reshape(N, K, 3)
    forces = jnp.einsum("nkab,nka->nkb", Rk, lam_k) / dt
    return u_plus, forces
