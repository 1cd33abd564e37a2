"""Fused Pallas physics kernels: the 1 kHz inner loop on-chip.

The XLA path (physics/engine.py substep_batch) lowers each substep to
dozens of small HBM-bound kernels — every (N, nb, 6, 6) intermediate makes
a round trip to HBM, and measured throughput saturates ~215k env-steps/s
regardless of N (bandwidth-bound). These kernels keep the substep — PD
torque, forward kinematics, joint screws, spatial inertias, CRBA mass
matrix, velocity/bias recursion, plane contact, the 18x18 Cholesky solve
and the semi-implicit Euler update — in vector registers/VMEM, with the
env axis on the 128-wide lane dimension.

Two entry points:

* build_substep_fn: one kernel per 1 kHz substep (exact; scanned by
  engine.control_step_pallas).
* build_control_fn: ONE kernel per control step — the full
  `decimation`-substep loop runs inside the kernel (state never touches
  HBM between substeps), optionally with the CRBA mass matrix factorized
  once per control step and its Cholesky factor reused by every substep
  (freeze=True; joint excursion per control period is <~1e-2 rad, the
  same order of approximation a TGS-style iterative solver makes — see
  engine.substep_batch_cached).

Applicability (checked by `pallas_substep_supported`): TPU backend, flat
plane terrain, no per-env COM/inertia overrides, plain PD (no per-env
gain/offset randomization), env count a multiple of the block size. The
env layer falls back to the XLA path otherwise — results agree to float32
roundoff (see tests/test_physics_kernel.py).

Everything model-dependent (topology, joint frames, inertias, contact
points) is baked in as Python-float constants at trace time, exactly like
the unrolled XLA path.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# scalar-per-lane helpers: values are Python lists of (BN,) lane vectors
# ---------------------------------------------------------------------------


def _qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return [
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ]


def _qrot(q, v):
    """Rotate v by quaternion q: v + 2w(qv x v) + 2 qv x (qv x v)."""
    w, x, y, z = q
    cx = y * v[2] - z * v[1]
    cy = z * v[0] - x * v[2]
    cz = x * v[1] - y * v[0]
    c2x = y * cz - z * cy
    c2y = z * cx - x * cz
    c2z = x * cy - y * cx
    return [
        v[0] + 2.0 * (w * cx + c2x),
        v[1] + 2.0 * (w * cy + c2y),
        v[2] + 2.0 * (w * cz + c2z),
    ]


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _qmat(q):
    """3x3 rotation matrix entries from quaternion, row-major list."""
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]


# ---------------------------------------------------------------------------
# physics stages (shared by the per-substep and fused control kernels)
# ---------------------------------------------------------------------------


def _pd_torque(qj, u, targets, mk, gains=None):
    """PD torque with clamping (humanoid_env.py:910-925 semantics).

    gains, when given, is (kp_eff, kd_eff, strength) lists of per-env lane
    vectors — the randomized motor model of legged_robot.py:369-387 (motor
    offsets are folded into `targets` by the env layer). The clip applies
    AFTER the strength factor, matching env.torque_fn."""
    tau = []
    for k in range(mk["nj"]):
        if gains is None:
            t = mk["kp"][k] * (targets[k] - qj[k]) - mk["kd"][k] * u[6 + k]
        else:
            kp_eff, kd_eff, strength = gains
            t = (
                kp_eff[k] * (targets[k] - qj[k]) - kd_eff[k] * u[6 + k]
            ) * strength[k]
        lim = mk["tau_lim"][k]
        tau.append(jnp.clip(t, -lim, lim))
    return tau


def _fk(base_pos, base_quat, qj, mk, one):
    """Forward kinematics (kinematics.py fk): world pose of every body."""
    parent = mk["parent"]
    pos = [base_pos]
    quat = [base_quat]
    for k in range(mk["nj"]):
        p = parent[k + 1]
        jr = mk["joint_rot_quat"][k]          # python floats (4,)
        q_fixed = _qmul(quat[p], [jr[0] * one, jr[1] * one,
                                  jr[2] * one, jr[3] * one])
        ax = mk["joint_axis"][k]
        half = 0.5 * qj[k]
        ch, sh = jnp.cos(half), jnp.sin(half)
        q_joint = [ch, ax[0] * sh, ax[1] * sh, ax[2] * sh]
        quat.append(_qmul(q_fixed, q_joint))
        jp = mk["joint_pos"][k]
        off = _qrot(quat[p], [jp[0] * one, jp[1] * one, jp[2] * one])
        pos.append([pos[p][i] + off[i] for i in range(3)])
    return pos, quat


def _screws(pos, quat, mk, one):
    """Joint screws in the Plücker-at-base frame (base = unit screws)."""
    A = pos[0]
    S = []
    for i in range(6):
        S.append([one if j == i else 0.0 * one for j in range(6)])
    w_ax = []
    anchors = []
    for k in range(mk["nj"]):
        ax = mk["joint_axis"][k]
        w = _qrot(quat[k + 1], [ax[0] * one, ax[1] * one, ax[2] * one])
        anchor = [pos[k + 1][i] - A[i] for i in range(3)]
        lin = _cross(anchor, w)
        w_ax.append(w)
        anchors.append(anchor)
        S.append(w + lin)
    return S, w_ax, anchors


def _spatial_inertias(pos, quat, masses, mk, one, com=None, inertia=None):
    """Per-body 6x6 spatial inertias about the base point A.
    I_sp = [[I_w + m r~ r~^T, m r~], [m r~^T, m 1]] with r = com_w - A.

    com/inertia, when given, are per-env lane-vector overrides (body-frame
    COM [nb][3] and symmetric inertia [nb][xx,xy,xz,yy,yz,zz]) for the
    extended body domain randomization (legged_robot.py:313-367); otherwise
    the model constants are baked in."""
    A = pos[0]
    nb = mk["nj"] + 1
    I_sp = []
    for b in range(nb):
        R = _qmat(quat[b])
        cb = mk["com"][b] if com is None else com[b]
        com_w = [
            pos[b][i] + R[i][0] * cb[0] + R[i][1] * cb[1] + R[i][2] * cb[2]
            for i in range(3)
        ]
        if inertia is None:
            Ib = mk["inertia"][b]  # 3x3 python floats
        else:
            i6 = inertia[b]        # lane vectors xx,xy,xz,yy,yz,zz
            Ib = [
                [i6[0], i6[1], i6[2]],
                [i6[1], i6[3], i6[4]],
                [i6[2], i6[4], i6[5]],
            ]
        RI = [[sum(R[i][k] * Ib[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        I_w = [[sum(RI[i][k] * R[j][k] for k in range(3)) for j in range(3)]
               for i in range(3)]
        r = [com_w[i] - A[i] for i in range(3)]
        m = masses[b]
        rr = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
        TL = [[I_w[i][j] + m * ((rr if i == j else 0.0) - r[i] * r[j])
               for j in range(3)] for i in range(3)]
        rx = [[0.0 * one, -r[2], r[1]],
              [r[2], 0.0 * one, -r[0]],
              [-r[1], r[0], 0.0 * one]]
        TR = [[m * rx[i][j] for j in range(3)] for i in range(3)]
        M66 = [[None] * 6 for _ in range(6)]
        for i in range(3):
            for j in range(3):
                M66[i][j] = TL[i][j]
                M66[i][3 + j] = TR[i][j]
                M66[3 + i][j] = TR[j][i]
                M66[3 + i][3 + j] = m * one if i == j else 0.0 * one
        I_sp.append(M66)
    return I_sp


def _mat6vec(M66, v6):
    return [sum(M66[i][j] * v6[j] for j in range(6)) for i in range(6)]


def _vel_bias(u, S, I_sp, mk, one):
    """Velocity recursion + generalized bias forces C(q, u) incl. gravity
    and joint damping (dynamics.py)."""
    parent = mk["parent"]
    nj = mk["nj"]
    nb = nj + 1
    v_sp = [u[0:6]]
    # gravity trick: base bias acceleration = -g_vec, i.e. +9.81 upward
    # (mk["gravity"] stores -model.gravity; dynamics.py:131-133)
    g = mk["gravity"]
    a_sp = [[0.0 * one] * 3 + [0.0 * one, 0.0 * one, g * one]]
    for k in range(nj):
        p = parent[k + 1]
        vJ = [S[6 + k][i] * u[6 + k] for i in range(6)]
        vb = [v_sp[p][i] + vJ[i] for i in range(6)]
        v_sp.append(vb)
        aw = _cross(vb[0:3], vJ[0:3])
        al = [
            x + y
            for x, y in zip(_cross(vb[3:6], vJ[0:3]), _cross(vb[0:3], vJ[3:6]))
        ]
        a_sp.append([a_sp[p][i] + (aw + al)[i] for i in range(6)])

    f_b = []
    for b in range(nb):
        Iv = _mat6vec(I_sp[b], v_sp[b])
        Ia = _mat6vec(I_sp[b], a_sp[b])
        n_, f_ = Iv[0:3], Iv[3:6]
        wv, vl = v_sp[b][0:3], v_sp[b][3:6]
        top = [x + y for x, y in zip(_cross(wv, n_), _cross(vl, f_))]
        bot = _cross(wv, f_)
        f_b.append([Ia[i] + (top + bot)[i] for i in range(6)])

    gacc = [list(f) for f in f_b]
    for b in range(nb - 1, 0, -1):
        p = parent[b]
        for i in range(6):
            gacc[p][i] = gacc[p][i] + gacc[b][i]
    C = gacc[0][:]  # base rows
    for k in range(nj):
        C.append(sum(S[6 + k][i] * gacc[k + 1][i] for i in range(6)))
    for k in range(nj):
        C[6 + k] = C[6 + k] + mk["dof_damping"][k] * u[6 + k]
    return v_sp, C


def _crba_chol(S, I_sp, mk, one):
    """Composite inertias -> CRBA mass matrix (lower triangle, structural
    zeros as None) -> unrolled dense Cholesky. Returns (L, invd)."""
    parent = mk["parent"]
    nj = mk["nj"]
    nb = nj + 1
    nv = nj + 6
    IC = [[[x for x in row] for row in I_sp[b]] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = parent[b]
        for i in range(6):
            for j in range(6):
                IC[p][i][j] = IC[p][i][j] + IC[b][i][j]
    F = []
    for v in range(6):
        F.append([IC[0][i][v] for i in range(6)])  # IC0 @ e_v = column v
    for k in range(nj):
        F.append(_mat6vec(IC[k + 1], S[6 + k]))
    # lower-triangular M via ancestry (anc[i][j]: dof j is ancestor-or-self
    # of dof i, both joint dofs; base dofs couple with everything)
    anc = mk["dof_anc"]
    M = [[None] * nv for _ in range(nv)]
    for i in range(nv):
        for j in range(i + 1):
            if i < 6:
                val = F[j][i]                      # base-base: IC0 entries
            elif j < 6:
                # joint-base coupling: F_i = IC_subtree(i) S_i, component j
                # (CRBA base rows; dynamics.py D[:6,:]=1 keeps U[j][i])
                val = F[i][j]
            else:
                a, b = i - 6, j - 6
                if anc[b][a]:   # a ancestor-or-self of b: S_a . F_b
                    val = sum(S[i][t] * F[j][t] for t in range(6))
                elif anc[a][b]:  # b ancestor of a: S_b . F_a
                    val = sum(S[j][t] * F[i][t] for t in range(6))
                else:
                    val = None                      # different legs: zero
            M[i][j] = val
    for k in range(nj):
        M[6 + k][6 + k] = M[6 + k][6 + k] + mk["armature"][k]

    # dense unrolled Cholesky (None entries = structural zeros)
    L = [[None] * nv for _ in range(nv)]
    invd = [None] * nv
    for j in range(nv):
        s = M[j][j]
        for k in range(j):
            if L[j][k] is not None:
                s = s - L[j][k] * L[j][k]
        iv = jax.lax.rsqrt(s)
        invd[j] = iv
        L[j][j] = s * iv
        for i in range(j + 1, nv):
            t = M[i][j] if M[i][j] is not None else None
            for k in range(j):
                if L[i][k] is not None and L[j][k] is not None:
                    t = (0.0 * one if t is None else t) - L[i][k] * L[j][k]
            L[i][j] = None if t is None else t * iv
    return L, invd


def _chol_solve(L, invd, rhs, nv):
    """Forward/back substitution with the (sparsity-aware) factor."""
    y = [None] * nv
    for i in range(nv):
        s = rhs[i]
        for k in range(i):
            if L[i][k] is not None:
                s = s - L[i][k] * y[k]
        y[i] = s * invd[i]
    udot = [None] * nv
    for i in reversed(range(nv)):
        s = y[i]
        for k in range(i + 1, nv):
            if L[k][i] is not None:
                s = s - L[k][i] * udot[k]
        udot[i] = s * invd[i]
    return udot


def _contact(pos, quat, v_sp, anchors, w_ax, mu, mk, one, planes=None,
             pts=None):
    """Compliant plane contact at baked offsets: foot sole corners +
    termination proxy spheres. Returns generalized forces + diagnostics.

    planes, when given, is a per-contact-point local terrain plane
    [c0, gx, gy] (lane vectors): ground height at xy is c0 + gx*x + gy*y,
    the tangent plane of the bilinear heightfield at the control step's
    entry position (sampled by the env layer once per control step — the
    in-kernel heightfield path; None = flat plane z=0).

    pts, when given, is [(pt_i, (b, off, foot_i, rad)), ...] — a subset
    of mk["contact_pts"] with original indices (the PGS path keeps only
    the termination spheres on this penalty model)."""
    A = pos[0]
    nv = mk["nj"] + 6
    kn, cn, vreg = mk["kn"], mk["cn"], mk["v_reg"]
    tau_gen = [0.0 * one for _ in range(nv)]
    foot_f = [[0.0 * one] * 3 for _ in range(len(mk["foot_bodies"]))]
    term_f = []
    if pts is None:
        pts = list(enumerate(mk["contact_pts"]))
    for pt_i, (b, off, foot_i, rad) in pts:
        o = _qrot(quat[b], [off[0] * one, off[1] * one, off[2] * one])
        p = [pos[b][i] + o[i] for i in range(3)]
        if rad is not None:
            p[2] = p[2] - rad
        rel = [p[i] - A[i] for i in range(3)]
        vlin = [
            v_sp[b][3 + i] + _cross(v_sp[b][0:3], rel)[i] for i in range(3)
        ]
        if planes is None:
            phi = p[2]
            pen = (phi < 0.0).astype(phi.dtype)
            fn = jnp.maximum(0.0, -kn * phi - cn * vlin[2]) * pen
            speed = jnp.sqrt(
                vlin[0] * vlin[0] + vlin[1] * vlin[1] + vreg * vreg
            )
            scale = mu * fn / speed
            f = [-scale * vlin[0], -scale * vlin[1], fn]
        else:
            # normal-aligned contact against the local tangent plane
            # (matches contact._point_forces grads path: penetration along
            # the plane normal, friction in the tangent plane — walls on
            # trimesh-mode terrain push back instead of lifting)
            c0, gx, gy = planes[pt_i]
            phi_z = p[2] - (c0 + gx * p[0] + gy * p[1])
            inv_l = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
            nrm = [-gx * inv_l, -gy * inv_l, inv_l]
            phi = phi_z * inv_l
            pen = (phi < 0.0).astype(phi.dtype)
            v_n = (
                vlin[0] * nrm[0] + vlin[1] * nrm[1] + vlin[2] * nrm[2]
            )
            fn = jnp.maximum(0.0, -kn * phi - cn * v_n) * pen
            vt = [vlin[i] - v_n * nrm[i] for i in range(3)]
            speed = jnp.sqrt(
                vt[0] * vt[0] + vt[1] * vt[1] + vt[2] * vt[2] + vreg * vreg
            )
            scale = mu * fn / speed
            f = [fn * nrm[i] - scale * vt[i] for i in range(3)]
        if foot_i is not None:
            for i in range(3):
                foot_f[foot_i][i] = foot_f[foot_i][i] + f[i]
        else:
            term_f.append(fn)
        n_mom = _cross(rel, f)
        for i in range(3):
            tau_gen[i] = tau_gen[i] + n_mom[i]
            tau_gen[3 + i] = tau_gen[3 + i] + f[i]
        for k in mk["body_anc_joints"][b]:
            lin_j = _cross(anchors[k], w_ax[k])
            tau_gen[6 + k] = tau_gen[6 + k] + (
                n_mom[0] * w_ax[k][0] + n_mom[1] * w_ax[k][1]
                + n_mom[2] * w_ax[k][2]
                + f[0] * lin_j[0] + f[1] * lin_j[1] + f[2] * lin_j[2]
            )
    return tau_gen, foot_f, term_f


def _pgs_prepare(pos, quat, anchors, w_ax, L, invd, mk, one, planes=None):
    """Configuration-dependent PGS structures: contact frames, sparse
    Jacobian rows, and the Delassus operator A = J M^-1 J^T. Under
    freeze_mass_matrix these are built ONCE per control step from the
    entry configuration (like the Cholesky factor itself) and reused by
    every substep — point positions drift <~1 mm within the 10 ms window,
    so A changes by <~0.5% while the expensive part of the solve
    (24 triangular solves + the symmetric fill) drops out of the substep
    loop. Penetrations/bias/velocities stay per-substep (_pgs_apply)."""
    nj = mk["nj"]
    nv = nj + 6
    A0 = pos[0]
    zero = 0.0 * one

    foot_pts = [(i, cp) for i, cp in enumerate(mk["contact_pts"])
                if cp[2] is not None]
    K = len(foot_pts)
    R = 3 * K
    rowsJ = []       # (base6 lane-list, {joint: lane}) per constraint row
    frames = []      # (n, t1, t2) lane 3-lists per point
    for pt_i, (b, off, foot_i, rad) in foot_pts:
        o = _qrot(quat[b], [off[0] * one, off[1] * one, off[2] * one])
        p = [pos[b][i] + o[i] for i in range(3)]
        rel = [p[i] - A0[i] for i in range(3)]
        if planes is None:
            n = [zero, zero, one]
            t1 = [one, zero, zero]
            t2 = [zero, one, zero]
        else:
            c0, gx, gy = planes[pt_i]
            inv_l = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
            n = [-gx * inv_l, -gy * inv_l, inv_l]
            # branchless tangent basis: a = x-axis where |n_x|<0.9 else y
            ux = (jnp.abs(n[0]) < 0.9).astype(one.dtype)
            a = [ux, 1.0 - ux, zero]
            t1 = _cross(n, a)
            it1 = jax.lax.rsqrt(
                t1[0] * t1[0] + t1[1] * t1[1] + t1[2] * t1[2] + 1e-12
            )
            t1 = [t1[i] * it1 for i in range(3)]
            t2 = _cross(n, t1)
        frames.append((n, t1, t2))
        for d in (n, t1, t2):
            Jw = _cross(rel, d)              # omega part: r x d
            jd = {}
            for k in mk["body_anc_joints"][b]:
                lin_j = _cross(anchors[k], w_ax[k])
                wxr = _cross(w_ax[k], rel)
                jd[k] = (
                    d[0] * (lin_j[0] + wxr[0])
                    + d[1] * (lin_j[1] + wxr[1])
                    + d[2] * (lin_j[2] + wxr[2])
                )
            rowsJ.append((Jw + list(d), jd))

    # Delassus A = J M^-1 J^T (symmetric; one solve per column)
    Amat = [[None] * R for _ in range(R)]
    for c in range(R):
        Jc6, jdc = rowsJ[c]
        dense = Jc6 + [jdc.get(k, zero) for k in range(nj)]
        Wc = _chol_solve(L, invd, dense, nv)
        for r in range(c + 1):
            Jr6, jdr = rowsJ[r]
            s = Jr6[0] * Wc[0]
            for i in range(1, 6):
                s = s + Jr6[i] * Wc[i]
            for k, val in jdr.items():
                s = s + val * Wc[6 + k]
            Amat[r][c] = s
            Amat[c][r] = s
    return rowsJ, frames, Amat


def _pgs_contact(pos, quat, v_sp, anchors, w_ax, mu, u, tau, C, L, invd,
                 mk, one, planes=None, prep=None, lam0=None):
    """Constraint-based foot contact inside the kernel: the block-PGS
    impulse solve of physics/pgs.py in scalar-per-lane form.

    Velocity time-stepping: u_free = u + h M^-1 (tau_pd + tau_spheres - C),
    then per foot point 0 <= lam_n _|_ v_n+ + b + gam lam_n >= 0 with the
    Coulomb cone on the tangentials, swept by PGS (fori_loop over
    iterations, contacts unrolled). Termination proxy spheres stay on the
    penalty model (falls only). prep, when given, is a frozen
    (rowsJ, frames, Amat) from _pgs_prepare; penetrations, bias and
    velocities are always fresh. lam0, when given, warm-starts the sweep
    from the previous substep's impulses (contact impulses vary smoothly
    across 1 ms substeps, so the sweep starts near the solution — the
    standard PGS warm start, same as MuJoCo's warmstart accel / PhysX).
    Returns (u_plus (nv,), foot_f, term_f, lam)."""
    nj = mk["nj"]
    nv = nj + 6
    dt = mk["dt"]
    pg = mk["pgs"]
    zero = 0.0 * one

    foot_pts = [(i, cp) for i, cp in enumerate(mk["contact_pts"])
                if cp[2] is not None]
    sph_pts = [(i, cp) for i, cp in enumerate(mk["contact_pts"])
               if cp[2] is None]
    tau_sph, _, term_f = _contact(
        pos, quat, v_sp, anchors, w_ax, mu, mk, one, planes=planes,
        pts=sph_pts,
    )

    # free velocity (spatial)
    rhs = list(tau_sph)
    for k in range(nj):
        rhs[6 + k] = rhs[6 + k] + tau[k]
    rhs = [rhs[i] - C[i] for i in range(nv)]
    udot_free = _chol_solve(L, invd, rhs, nv)
    u_free = [u[i] + dt * udot_free[i] for i in range(nv)]

    if prep is None:
        prep = _pgs_prepare(pos, quat, anchors, w_ax, L, invd, mk, one,
                            planes=planes)
    rowsJ, frames, Amat = prep
    K = len(foot_pts)
    R = 3 * K

    # fresh penetrations (current positions against the frozen frames)
    phi_l = []
    for pt_i, (b, off, foot_i, rad) in foot_pts:
        o = _qrot(quat[b], [off[0] * one, off[1] * one, off[2] * one])
        p = [pos[b][i] + o[i] for i in range(3)]
        if planes is None:
            phi_l.append(p[2])
        else:
            c0, gx, gy = planes[pt_i]
            phi_z = p[2] - (c0 + gx * p[0] + gy * p[1])
            inv_l = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
            phi_l.append(phi_z * inv_l)

    # v_free in contact coordinates
    vf = []
    for c in range(R):
        Jc6, jdc = rowsJ[c]
        s = Jc6[0] * u_free[0]
        for i in range(1, 6):
            s = s + Jc6[i] * u_free[i]
        for k, val in jdc.items():
            s = s + val * u_free[6 + k]
        vf.append(s)

    erp, cfm, slop = pg["erp"], pg["cfm"], pg["slop"]
    bias = [-(erp / dt) * jnp.maximum(-phi_l[k] - slop, 0.0)
            for k in range(K)]
    act = [(phi_l[k] < 0.0).astype(one.dtype) for k in range(K)]

    def sweep(_, lam):
        lam = list(lam)
        for k in range(K):
            i0 = 3 * k
            vrow = []
            for d in range(3):
                s = vf[i0 + d] + Amat[i0 + d][0] * lam[0]
                for c in range(1, R):
                    s = s + Amat[i0 + d][c] * lam[c]
                vrow.append(s)
            Ann = Amat[i0][i0]
            gam = cfm * Ann
            ln = lam[i0]
            ln_new = jnp.maximum(
                0.0, ln - (vrow[0] + bias[k] + gam * ln) / (Ann + gam)
            ) * act[k]
            dln = ln_new - ln
            vt1 = vrow[1] + Amat[i0 + 1][i0] * dln
            vt2 = vrow[2] + Amat[i0 + 2][i0] * dln
            a11 = Amat[i0 + 1][i0 + 1] + gam
            a22 = Amat[i0 + 2][i0 + 2] + gam
            a12 = Amat[i0 + 1][i0 + 2]
            det = a11 * a22 - a12 * a12
            r1 = vt1 + gam * lam[i0 + 1]
            r2 = vt2 + gam * lam[i0 + 2]
            lt1 = lam[i0 + 1] - (a22 * r1 - a12 * r2) / det
            lt2 = lam[i0 + 2] - (a11 * r2 - a12 * r1) / det
            tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
            sc = jnp.minimum(1.0, mu * ln_new / tn) * act[k]
            lam[i0] = ln_new
            lam[i0 + 1] = lt1 * sc
            lam[i0 + 2] = lt2 * sc
        return tuple(lam)

    lam = jax.lax.fori_loop(
        0, pg["iters"], sweep,
        tuple(zero for _ in range(R)) if lam0 is None else tuple(lam0),
    )

    # u+ = u_free + M^-1 J^T lam
    jtl = [zero] * nv
    for c in range(R):
        Jc6, jdc = rowsJ[c]
        for i in range(6):
            jtl[i] = jtl[i] + Jc6[i] * lam[c]
        for k, val in jdc.items():
            jtl[6 + k] = jtl[6 + k] + val * lam[c]
    du = _chol_solve(L, invd, jtl, nv)
    u_plus = [u_free[i] + du[i] for i in range(nv)]

    foot_f = [[zero] * 3 for _ in range(len(mk["foot_bodies"]))]
    for k in range(K):
        _, (b, off, foot_i, rad) = foot_pts[k]
        n, t1, t2 = frames[k]
        for i in range(3):
            foot_f[foot_i][i] = foot_f[foot_i][i] + (
                n[i] * lam[3 * k] + t1[i] * lam[3 * k + 1]
                + t2[i] * lam[3 * k + 2]
            ) / dt
    return u_plus, foot_f, term_f, lam


def _integrate_from_u(base_pos, base_quat, qj, u, u_plus, mk, one):
    """Position integration from an impulse-solved velocity: apply the
    spatial->conventional correction dt*(omega x v) (old-state omega/v,
    same convention as _integrate), then semi-implicit Euler."""
    nj = mk["nj"]
    dt = mk["dt"]
    corr = _cross(u[0:3], u[3:6])
    u_new = list(u_plus)
    for i in range(3):
        u_new[3 + i] = u_new[3 + i] + dt * corr[i]
    new_pos = [base_pos[i] + dt * u_new[3 + i] for i in range(3)]
    om = [u_new[i] * dt for i in range(3)]
    ang = jnp.sqrt(om[0] * om[0] + om[1] * om[1] + om[2] * om[2])
    half = 0.5 * ang
    small = ang < 1e-8
    kfac = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, ang))
    dq = [jnp.cos(half), om[0] * kfac, om[1] * kfac, om[2] * kfac]
    qn = _qmul(dq, base_quat)
    nrm = jax.lax.rsqrt(
        qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2] + qn[3] * qn[3]
        + 1e-12
    )
    new_quat = [qn[i] * nrm for i in range(4)]
    new_qj = [qj[k] + dt * u_new[6 + k] for k in range(nj)]
    return new_pos, new_quat, new_qj, u_new


def _integrate(base_pos, base_quat, qj, u, udot_sp, mk, one):
    """Spatial -> conventional base acceleration, semi-implicit Euler,
    quaternion exp-map integration (spatial.py:95-110)."""
    nj = mk["nj"]
    dt = mk["dt"]
    lin = [
        udot_sp[3 + i] + _cross(u[0:3], u[3:6])[i] for i in range(3)
    ]
    udot = udot_sp[0:3] + lin + udot_sp[6:]
    u_new = [u[i] + dt * udot[i] for i in range(len(u))]

    new_pos = [base_pos[i] + dt * u_new[3 + i] for i in range(3)]
    om = [u_new[i] * dt for i in range(3)]
    ang = jnp.sqrt(om[0] * om[0] + om[1] * om[1] + om[2] * om[2])
    half = 0.5 * ang
    small = ang < 1e-8
    kfac = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, ang))
    dq = [jnp.cos(half), om[0] * kfac, om[1] * kfac, om[2] * kfac]
    qn = _qmul(dq, base_quat)
    nrm = jax.lax.rsqrt(
        qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2] + qn[3] * qn[3]
        + 1e-12
    )
    new_quat = [qn[i] * nrm for i in range(4)]
    new_qj = [qj[k] + dt * u_new[6 + k] for k in range(nj)]
    return new_pos, new_quat, new_qj, u_new


def _substep_core(base_pos, base_quat, qj, u, masses, mu, targets, mk, one,
                  frozen_chol=None, gains=None, com=None, inertia=None,
                  planes=None, pgs_prep=None, lam0=None):
    """One full substep from unpacked lane vectors. frozen_chol, if given,
    is a precomputed (L, invd) reused instead of factoring this substep's
    mass matrix; pgs_prep likewise a frozen (rowsJ, frames, Amat) from
    _pgs_prepare; lam0 a warm-start impulse from the previous substep.
    gains/com/inertia/planes are the optional per-env
    domain-randomization / terrain inputs (see _pd_torque,
    _spatial_inertias, _contact). Returns (new state rows, diag pieces,
    lam — None on the penalty path)."""
    nv = mk["nj"] + 6
    tau = _pd_torque(qj, u, targets, mk, gains=gains)
    pos, quat = _fk(base_pos, base_quat, qj, mk, one)
    S, w_ax, anchors = _screws(pos, quat, mk, one)
    I_sp = _spatial_inertias(pos, quat, masses, mk, one, com=com,
                             inertia=inertia)
    v_sp, C = _vel_bias(u, S, I_sp, mk, one)
    if frozen_chol is None:
        L, invd = _crba_chol(S, I_sp, mk, one)
    else:
        L, invd = frozen_chol
    if mk.get("pgs") is not None:
        u_plus, foot_f, term_f, lam = _pgs_contact(
            pos, quat, v_sp, anchors, w_ax, mu, u, tau, C, L, invd, mk,
            one, planes=planes, prep=pgs_prep, lam0=lam0,
        )
        new_pos, new_quat, new_qj, u_new = _integrate_from_u(
            base_pos, base_quat, qj, u, u_plus, mk, one
        )
        diag = (pos, quat, v_sp, foot_f, term_f, tau)
        return new_pos, new_quat, new_qj, u_new, diag, lam
    tau_gen, foot_f, term_f = _contact(
        pos, quat, v_sp, anchors, w_ax, mu, mk, one, planes=planes
    )
    for k in range(mk["nj"]):
        tau_gen[6 + k] = tau_gen[6 + k] + tau[k]
    rhs = [tau_gen[i] - C[i] for i in range(nv)]
    udot = _chol_solve(L, invd, rhs, nv)
    new_pos, new_quat, new_qj, u_new = _integrate(
        base_pos, base_quat, qj, u, udot, mk, one
    )
    diag = (pos, quat, v_sp, foot_f, term_f, tau)
    return new_pos, new_quat, new_qj, u_new, diag, None


def _write_diag(diag_ref, diag, mk):
    pos, quat, v_sp, foot_f, term_f, tau = diag
    nb = mk["nj"] + 1
    row = 0
    for b in range(nb):
        for i in range(3):
            diag_ref[row] = pos[b][i]
            row += 1
    for b in range(nb):
        for i in range(4):
            diag_ref[row] = quat[b][i]
            row += 1
    for b in range(nb):
        for i in range(3):
            diag_ref[row] = v_sp[b][i]
            row += 1
    for ff in foot_f:
        for i in range(3):
            diag_ref[row] = ff[i]
            row += 1
    for tf in term_f:
        diag_ref[row] = tf
        row += 1
    for k in range(mk["nj"]):
        diag_ref[row] = tau[k]
        row += 1


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _unpack_extras(extra_refs, mk, feats):
    """Unpack the optional per-env input refs (see _extra_rows for the
    row layout) into the lane-vector structures _substep_core expects."""
    nj = mk["nj"]
    nb = nj + 1
    n_pts = len(mk["contact_pts"])
    it = iter(extra_refs)
    gains = com = inertia = planes = None
    if feats["gains"]:
        g = next(it)   # rows: kp_eff(nj) | kd_eff(nj) | strength(nj)
        gains = (
            [g[k] for k in range(nj)],
            [g[nj + k] for k in range(nj)],
            [g[2 * nj + k] for k in range(nj)],
        )
    if feats["body"]:
        c = next(it)   # rows: com xyz per body
        com = [[c[b * 3 + i] for i in range(3)] for b in range(nb)]
        iref = next(it)  # rows: xx,xy,xz,yy,yz,zz per body
        inertia = [[iref[b * 6 + i] for i in range(6)] for b in range(nb)]
    if feats["planes"]:
        p = next(it)   # rows: c0,gx,gy per contact point
        planes = [[p[i * 3 + j] for j in range(3)] for i in range(n_pts)]
    return gains, com, inertia, planes


def _extra_rows(mk, feats):
    """Row counts of the optional inputs, in ref order."""
    nj = mk["nj"]
    nb = nj + 1
    n_pts = len(mk["contact_pts"])
    rows = []
    if feats["gains"]:
        rows.append(3 * nj)
    if feats["body"]:
        rows.append(3 * nb)
        rows.append(6 * nb)
    if feats["planes"]:
        rows.append(3 * n_pts)
    return rows


def _substep_kernel(
    state_ref, mass_ref, fric_ref, tgt_ref, *rest, mk, feats
):
    """One exact substep (mk: dict of static model/config constants)."""
    nj = mk["nj"]
    nb = nj + 1
    nv = nj + 6
    extra_refs = rest[:-2]
    out_ref, diag_ref = rest[-2], rest[-1]

    # rows: [pos(3), quat(4), qj(nj), u(nv)]
    base_pos = [state_ref[i] for i in range(3)]
    base_quat = [state_ref[3 + i] for i in range(4)]
    qj = [state_ref[7 + i] for i in range(nj)]
    u = [state_ref[7 + nj + i] for i in range(nv)]
    masses = [mass_ref[b] for b in range(nb)]
    mu = fric_ref[0]
    targets = [tgt_ref[k] for k in range(nj)]
    one = jnp.ones_like(mu)
    gains, com, inertia, planes = _unpack_extras(extra_refs, mk, feats)

    new_pos, new_quat, new_qj, u_new, diag, _lam = _substep_core(
        base_pos, base_quat, qj, u, masses, mu, targets, mk, one,
        gains=gains, com=com, inertia=inertia, planes=planes,
    )

    row = 0
    for v in new_pos + new_quat + new_qj + u_new:
        out_ref[row] = v
        row += 1
    _write_diag(diag_ref, diag, mk)


def _control_kernel(
    state_ref, mass_ref, fric_ref, tgt_ref, *rest, mk, decimation, freeze,
    feats
):
    """A whole decimated control step in one kernel: the substep loop runs
    on-chip (lax.fori_loop over a lane-vector pytree carry), so state never
    round-trips to HBM between substeps. With freeze=True the mass matrix
    is factorized ONCE from the entry configuration and its Cholesky
    factor is reused by every substep (engine.substep_batch_cached
    approximation). diag_ref holds the LAST substep's diagnostics
    (reference refresh semantics, humanoid_env.py:649-651)."""
    nj = mk["nj"]
    nb = nj + 1
    nv = nj + 6
    extra_refs = rest[:-2]
    out_ref, diag_ref = rest[-2], rest[-1]

    base_pos = [state_ref[i] for i in range(3)]
    base_quat = [state_ref[3 + i] for i in range(4)]
    qj = [state_ref[7 + i] for i in range(nj)]
    u = [state_ref[7 + nj + i] for i in range(nv)]
    masses = [mass_ref[b] for b in range(nb)]
    mu = fric_ref[0]
    targets = [tgt_ref[k] for k in range(nj)]
    one = jnp.ones_like(mu)
    gains, com, inertia, planes = _unpack_extras(extra_refs, mk, feats)

    loop_chol = None
    loop_prep = None
    if freeze:
        pos0, quat0 = _fk(base_pos, base_quat, qj, mk, one)
        S0, w_ax0, anchors0 = _screws(pos0, quat0, mk, one)
        I0 = _spatial_inertias(pos0, quat0, masses, mk, one, com=com,
                               inertia=inertia)
        # the factor is closed over by the loop body: loop-invariant lane
        # vectors (None entries are compile-time structural zeros)
        loop_chol = _crba_chol(S0, I0, mk, one)
        if mk.get("pgs") is not None and mk["pgs"].get("freeze_prep"):
            # SHIPPING default (SimCfg.pgs_freeze_prep): freeze the PGS
            # contact frames/Jacobians/Delassus with the mass matrix
            # (same entry-configuration approximation); penetrations/
            # bias/velocities stay per-substep. Validated GREEN end-to-
            # end (flagship_freeze8: 26/26 gate + 8/9 matrix); the
            # companion warm-start below is the ingredient that broke
            # transfer — see SimCfg for the A/B record.
            loop_prep = _pgs_prepare(
                pos0, quat0, anchors0, w_ax0, loop_chol[0], loop_chol[1],
                mk, one, planes=planes,
            )

    # OPT-IN (SimCfg.pgs_warm_start): impulse carried across substeps so
    # each substep's sweep starts near its solution — see SimCfg for why
    # the default is a cold start
    n_foot_pts = sum(1 for cp in mk["contact_pts"] if cp[2] is not None)
    warm = mk.get("pgs") is not None and mk["pgs"].get("warm")
    R = 3 * n_foot_pts if warm else 0
    zero = 0.0 * one

    def body(_, carry):
        bp, bq, q, uu, lam = carry
        np_, nq, nqj, nu, diag, nlam = _substep_core(
            list(bp), list(bq), list(q), list(uu), masses, mu, targets, mk,
            one, frozen_chol=loop_chol, gains=gains, com=com,
            inertia=inertia, planes=planes, pgs_prep=loop_prep,
            lam0=list(lam) if R else None,
        )
        _write_diag(diag_ref, diag, mk)
        return (tuple(np_), tuple(nq), tuple(nqj), tuple(nu),
                tuple(nlam) if R else ())

    carry = (tuple(base_pos), tuple(base_quat), tuple(qj), tuple(u),
             tuple(zero for _ in range(R)))
    bp, bq, q, uu, _ = jax.lax.fori_loop(0, decimation, body, carry)

    row = 0
    for v in list(bp) + list(bq) + list(q) + list(uu):
        out_ref[row] = v
        row += 1


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


class KernelDiag(NamedTuple):
    body_pos: jnp.ndarray     # (N, nb, 3)
    body_quat: jnp.ndarray    # (N, nb, 4)
    body_omega: jnp.ndarray   # (N, nb, 3)
    foot_forces: jnp.ndarray  # (N, n_feet, 3)
    term_force: jnp.ndarray   # (N, nt)
    tau: jnp.ndarray          # (N, nj)


def _mat_to_quat_np(m):
    import numpy as np

    w = math.sqrt(max(0.0, 1.0 + m[0][0] + m[1][1] + m[2][2])) / 2.0
    if w > 1e-6:
        x = (m[2][1] - m[1][2]) / (4 * w)
        y = (m[0][2] - m[2][0]) / (4 * w)
        z = (m[1][0] - m[0][1]) / (4 * w)
    else:  # pragma: no cover - no such joint frames in practice
        x, y, z = 1.0, 0.0, 0.0
    n = math.sqrt(w * w + x * x + y * y + z * z)
    return (w / n, x / n, y / n, z / n)


def make_model_consts(model, kp, kd, tau_lim, contact_params, dt,
                      pgs_params=None):
    """Bake the static model/config into the python-constant dict the
    kernel unrolls over. pgs_params (a physics.pgs.PGSParams), when given,
    switches the foot contact from the penalty model to the in-kernel
    block-PGS impulse solve (_pgs_contact)."""
    nj = model.nj
    nb = nj + 1
    anc_m = model.ancestor_matrix()  # (nb, nj)
    dof_anc = [[0] * nj for _ in range(nj)]
    for a in range(nj):
        for b in range(nj):
            # joint a ancestor-or-self of joint b <-> a on path to body b+1
            dof_anc[b][a] = int(anc_m[b + 1][a] > 0)
    body_anc = [
        [k for k in range(nj) if anc_m[b][k] > 0] for b in range(nb)
    ]
    pt_body, pt_off = model.contact_points()
    contact_pts = []
    for idx, (b, off) in enumerate(zip(pt_body, pt_off)):
        foot_i = int(np.where(np.asarray(model.foot_bodies) == b)[0][0])
        contact_pts.append(
            (int(b), tuple(float(x) for x in off), foot_i, None)
        )
    for i in range(len(model.term_sphere_body)):
        contact_pts.append(
            (
                int(model.term_sphere_body[i]),
                tuple(float(x) for x in model.term_sphere_offset[i]),
                None,
                float(model.term_sphere_radius[i]),
            )
        )
    return dict(
        nj=nj,
        parent=[int(p) for p in model.parent],
        joint_axis=[tuple(float(x) for x in a) for a in model.joint_axis],
        joint_pos=[tuple(float(x) for x in p) for p in model.joint_pos],
        joint_rot_quat=[
            _mat_to_quat_np(np.asarray(model.joint_rot[k]).tolist())
            for k in range(nj)
        ],
        com=[tuple(float(x) for x in c) for c in model.com],
        inertia=[np.asarray(I).tolist() for I in model.inertia],
        armature=[float(a) for a in model.dof_armature],
        dof_damping=[float(d) for d in model.dof_damping],
        gravity=-float(model.gravity),
        dof_anc=dof_anc,
        body_anc_joints=body_anc,
        contact_pts=contact_pts,
        foot_bodies=[int(b) for b in model.foot_bodies],
        kp=[float(x) for x in np.asarray(kp)],
        kd=[float(x) for x in np.asarray(kd)],
        tau_lim=[float(x) for x in np.asarray(tau_lim)],
        kn=float(contact_params.kn),
        cn=float(contact_params.cn),
        v_reg=float(contact_params.v_reg),
        dt=float(dt),
        n_term=len(model.term_sphere_body),
        pgs=None if pgs_params is None else dict(
            iters=int(pgs_params.iterations),
            erp=float(pgs_params.erp),
            cfm=float(pgs_params.cfm_ratio),
            slop=float(pgs_params.slop),
            freeze_prep=bool(getattr(pgs_params, "freeze_prep", False)),
            warm=bool(getattr(pgs_params, "warm_start", False)),
        ),
    )


def pallas_substep_supported(model, params, terrain, N, dof_rand_on):
    """Static eligibility for the fused kernel. Per-env gains, body
    randomization, and heightfield terrain are supported via the optional
    kernel inputs (per_env_gains/per_env_body/terrain_planes), so the only
    remaining requirements are the TPU backend and a tileable env count."""
    del params, terrain, dof_rand_on
    if jax.default_backend() != "tpu":
        return False
    return _pick_block(N) is not None


def _pick_block(N):
    """(sublane, lane) tile per block. Lane vectors are (SUB, LB) 2D so
    every per-env value fills whole (8, 128) vregs — a 1D (block,) layout
    uses 1 of 8 sublanes per vreg and wastes ~7/8 of VPU issue width."""
    # measured on v5e (4096 envs): (8,128) 28.9ms < (8,256) 29.5 <
    # (8,512) 29.9 << (4,128)/(1,*) ~35ms per 60 control steps
    for sub, lb in ((8, 128), (8, 256), (8, 512), (4, 128), (2, 128),
                    (1, 128)):
        if N % (sub * lb) == 0:
            return sub, lb
    return None


def _shapes(model, mk, N):
    nj = mk["nj"]
    nb = nj + 1
    nv = nj + 6
    n_state = 7 + nj + nv
    nt = mk["n_term"]
    n_feet = len(mk["foot_bodies"])
    n_diag = nb * 10 + n_feet * 3 + nt + nj
    sub, lb = _pick_block(N)
    return nj, nb, nv, n_state, nt, n_feet, n_diag, sub, lb


def _unpack_diag(diag, mk, N):
    nb = mk["nj"] + 1
    n_feet = len(mk["foot_bodies"])
    nt = mk["n_term"]
    nj = mk["nj"]
    r = 0
    body_pos = out_slice(diag, r, nb * 3, N).reshape(N, nb, 3)
    r += nb * 3
    body_quat = out_slice(diag, r, nb * 4, N).reshape(N, nb, 4)
    r += nb * 4
    body_omega = out_slice(diag, r, nb * 3, N).reshape(N, nb, 3)
    r += nb * 3
    foot_forces = out_slice(diag, r, n_feet * 3, N).reshape(N, n_feet, 3)
    r += n_feet * 3
    term_force = out_slice(diag, r, nt, N).reshape(N, nt)
    r += nt
    tau = out_slice(diag, r, nj, N).reshape(N, nj)
    return KernelDiag(
        body_pos, body_quat, body_omega, foot_forces, term_force, tau
    )


def _build_kernel_fn(kernel, mk, N, n_state, nb, nj, n_diag, sub, lb,
                     feats):
    """Shared pallas_call wrapper: inputs are (rows, N) row-major; on
    device they are viewed as (rows, SUB, N//SUB) so each kernel block is
    a (rows, SUB, LB) tile of full vector registers. Optional per-env
    extras (gains/body/planes, env layout (N, rows)) follow the 4 core
    inputs in _extra_rows order."""
    from jax.experimental import pallas as pl

    lanes = N // sub
    grid = (lanes // lb,)
    extra_rows = _extra_rows(mk, feats)

    @jax.jit
    def call(state_pack, masses, friction, targets, *extras):
        # env-layer layouts: masses (N, nb), friction (N,), targets (N, nj)
        assert len(extras) == len(extra_rows)
        masses = masses.T.reshape(nb, sub, lanes)
        friction = friction.reshape(1, sub, lanes)
        targets = targets.T.reshape(nj, sub, lanes)
        state3 = state_pack.reshape(n_state, sub, lanes)
        extras3 = [
            e.T.reshape(r, sub, lanes) for e, r in zip(extras, extra_rows)
        ]

        def spec(rows):
            return pl.BlockSpec((rows, sub, lb), lambda g: (0, 0, g))

        out, diag = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(n_state), spec(nb), spec(1), spec(nj)]
            + [spec(r) for r in extra_rows],
            out_specs=[spec(n_state), spec(n_diag)],
            out_shape=[
                jax.ShapeDtypeStruct((n_state, sub, lanes),
                                     state_pack.dtype),
                jax.ShapeDtypeStruct((n_diag, sub, lanes),
                                     state_pack.dtype),
            ],
        )(state3, masses, friction, targets, *extras3)
        return (
            out.reshape(n_state, N),
            _unpack_diag(diag.reshape(-1, N), mk, N),
        )

    return call


def _feats(per_env_gains, per_env_body, terrain_planes):
    return dict(
        gains=bool(per_env_gains), body=bool(per_env_body),
        planes=bool(terrain_planes),
    )


def build_substep_fn(model, kp, kd, tau_lim, contact_params, dt, N,
                     per_env_gains=False, per_env_body=False,
                     terrain_planes=False, pgs_params=None):
    """Returns substep(state_pack, masses, friction, targets, *extras) ->
    (state_pack, KernelDiag). state_pack: (7+nj+nv, N)."""
    mk = make_model_consts(model, kp, kd, tau_lim, contact_params, dt,
                           pgs_params=pgs_params)
    nj, nb, nv, n_state, nt, n_feet, n_diag, sub, lb = _shapes(model, mk, N)
    feats = _feats(per_env_gains, per_env_body, terrain_planes)
    kernel = functools.partial(_substep_kernel, mk=mk, feats=feats)
    return _build_kernel_fn(
        kernel, mk, N, n_state, nb, nj, n_diag, sub, lb, feats
    )


def build_control_fn(model, kp, kd, tau_lim, contact_params, dt, N,
                     decimation, freeze=True, per_env_gains=False,
                     per_env_body=False, terrain_planes=False,
                     pgs_params=None):
    """Returns control(state_pack, masses, friction, targets, *extras) ->
    (state_pack, KernelDiag): the full decimated control step as ONE
    Pallas kernel (substep loop on-chip; freeze -> once-per-control-step
    mass-matrix factorization).

    Extras (each (N, rows), built by the env layer, see _extra_rows):
      per_env_gains  -> [kp_eff | kd_eff | strength]  (N, 3*nj)
      per_env_body   -> com (N, 3*nb), symmetric inertia (N, 6*nb)
      terrain_planes -> per-contact-point local plane [c0,gx,gy] (N, 3*P)
    """
    mk = make_model_consts(model, kp, kd, tau_lim, contact_params, dt,
                           pgs_params=pgs_params)
    nj, nb, nv, n_state, nt, n_feet, n_diag, sub, lb = _shapes(model, mk, N)
    feats = _feats(per_env_gains, per_env_body, terrain_planes)
    kernel = functools.partial(
        _control_kernel, mk=mk, decimation=int(decimation),
        freeze=bool(freeze), feats=feats,
    )
    return _build_kernel_fn(
        kernel, mk, N, n_state, nb, nj, n_diag, sub, lb, feats
    )


def out_slice(diag, row, n, N):
    return diag[row : row + n].T


def pack_state(phys):
    """PhysState (batched) -> (n_state, N) row-major pack."""
    return jnp.concatenate(
        [phys.base_pos, phys.base_quat, phys.qj, phys.u], axis=1
    ).T


def unpack_state(pack, nj):
    from ..physics.engine import PhysState

    s = pack.T
    return PhysState(
        base_pos=s[:, 0:3],
        base_quat=s[:, 3:7],
        qj=s[:, 7 : 7 + nj],
        u=s[:, 7 + nj :],
    )
