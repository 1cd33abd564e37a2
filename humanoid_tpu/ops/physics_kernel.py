"""Fused Pallas physics substep: the whole 1 kHz inner loop as ONE kernel.

The XLA path (physics/engine.py substep_batch) lowers each substep to
dozens of small HBM-bound kernels — every (N, nb, 6, 6) intermediate makes
a round trip to HBM, and measured throughput saturates ~215k env-steps/s
regardless of N (bandwidth-bound). This kernel keeps the entire substep —
PD torque, forward kinematics, joint screws, spatial inertias, CRBA mass
matrix, velocity/bias recursion, plane contact, the 18x18 Cholesky solve
and the semi-implicit Euler update — in vector registers/VMEM, with the
env axis on the 128-wide lane dimension. HBM traffic collapses to one
state read + one state/diag write per substep.

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
# the kernel
# ---------------------------------------------------------------------------


def _substep_kernel(
    state_ref, mass_ref, fric_ref, tgt_ref, out_ref, diag_ref, *, mk
):
    """mk: dict of static model/config constants (python floats/ints)."""
    nj = mk["nj"]
    nb = nj + 1
    nv = nj + 6
    parent = mk["parent"]            # list[int], len nb (parent[0] = -1)
    dt = mk["dt"]

    # ---- unpack state: rows [pos(3), quat(4), qj(nj), u(nv)] ----
    base_pos = [state_ref[i, :] for i in range(3)]
    base_quat = [state_ref[3 + i, :] for i in range(4)]
    qj = [state_ref[7 + i, :] for i in range(nj)]
    u = [state_ref[7 + nj + i, :] for i in range(nv)]
    masses = [mass_ref[b, :] for b in range(nb)]
    mu = fric_ref[0, :]
    targets = [tgt_ref[k, :] for k in range(nj)]

    one = jnp.ones_like(mu)

    # ---- PD torque (humanoid_env.py:910-925 semantics) ----
    tau = []
    for k in range(nj):
        t = mk["kp"][k] * (targets[k] - qj[k]) - mk["kd"][k] * u[6 + k]
        lim = mk["tau_lim"][k]
        tau.append(jnp.clip(t, -lim, lim))

    # ---- forward kinematics (kinematics.py fk) ----
    pos = [base_pos]
    quat = [base_quat]
    for k in range(nj):
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
    A = pos[0]

    # ---- joint screws in the Plücker-at-base frame ----
    S = []  # (nv) x 6 lane-vectors; base = unit screws (python consts)
    for i in range(6):
        S.append([one if j == i else 0.0 * one for j in range(6)])
    w_ax = []
    anchors = []
    for k in range(nj):
        ax = mk["joint_axis"][k]
        w = _qrot(quat[k + 1], [ax[0] * one, ax[1] * one, ax[2] * one])
        anchor = [pos[k + 1][i] - A[i] for i in range(3)]
        lin = _cross(anchor, w)
        w_ax.append(w)
        anchors.append(anchor)
        S.append(w + lin)

    # ---- per-body spatial inertias (6x6 symmetric, 21 unique) ----
    # I_sp = [[I_w + m r~ r~^T, m r~], [m r~^T, m 1]] with r = com_w - A
    I_sp = []  # list of 6x6 (row-major lists)
    for b in range(nb):
        R = _qmat(quat[b])
        cb = mk["com"][b]
        com_w = [
            pos[b][i] + R[i][0] * cb[0] + R[i][1] * cb[1] + R[i][2] * cb[2]
            for i in range(3)
        ]
        Ib = mk["inertia"][b]  # 3x3 python floats
        # I_w = R Ib R^T
        RI = [[sum(R[i][k] * Ib[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        I_w = [[sum(RI[i][k] * R[j][k] for k in range(3)) for j in range(3)]
               for i in range(3)]
        r = [com_w[i] - A[i] for i in range(3)]
        m = masses[b]
        # rx = skew(r); top-left = I_w + m rx rx^T; rx rx^T = |r|^2 I - r r^T
        rr = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
        TL = [[I_w[i][j] + m * ((rr if i == j else 0.0) - r[i] * r[j])
               for j in range(3)] for i in range(3)]
        # top-right = m rx
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

    # ---- velocity recursion + bias forces (dynamics.py) ----
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

    def mat6vec(M66, v6):
        return [sum(M66[i][j] * v6[j] for j in range(6)) for i in range(6)]

    f_b = []
    for b in range(nb):
        Iv = mat6vec(I_sp[b], v_sp[b])
        Ia = mat6vec(I_sp[b], a_sp[b])
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

    # ---- composite inertias + CRBA mass matrix (lower triangle) ----
    IC = [[[x for x in row] for row in I_sp[b]] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        p = parent[b]
        for i in range(6):
            for j in range(6):
                IC[p][i][j] = IC[p][i][j] + IC[b][i][j]
    # F_v = IC_dof[v] @ S[v];  IC_dof = IC[0] for base dofs, IC[body] for
    # joint dofs
    F = []
    for v in range(6):
        F.append([IC[0][i][v] for i in range(6)])  # IC0 @ e_v = column v
    for k in range(nj):
        F.append(mat6vec(IC[k + 1], S[6 + k]))
    # lower-triangular M via ancestry (anc[i][j]: dof j is ancestor-or-self
    # of dof i, both joint dofs; base dofs couple with everything)
    anc = mk["dof_anc"]  # (nj, nj) 0/1 python ints: anc[a][b]
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

    # ---- contact: foot sole corners + termination proxy spheres, plane ---
    kn, cn, vreg = mk["kn"], mk["cn"], mk["v_reg"]
    tau_gen = [0.0 * one for _ in range(nv)]
    foot_f = [[0.0 * one] * 3 for _ in range(len(mk["foot_bodies"]))]
    term_f = []
    pts = []  # (body, p(3), f(3))
    for (b, off, foot_i, rad) in mk["contact_pts"]:
        o = _qrot(quat[b], [off[0] * one, off[1] * one, off[2] * one])
        p = [pos[b][i] + o[i] for i in range(3)]
        if rad is not None:
            p[2] = p[2] - rad
        rel = [p[i] - A[i] for i in range(3)]
        vlin = [
            v_sp[b][3 + i] + _cross(v_sp[b][0:3], rel)[i] for i in range(3)
        ]
        phi = p[2]
        pen = (phi < 0.0).astype(phi.dtype)
        fn = jnp.maximum(0.0, -kn * phi - cn * vlin[2]) * pen
        speed = jnp.sqrt(vlin[0] * vlin[0] + vlin[1] * vlin[1] + vreg * vreg)
        scale = mu * fn / speed
        f = [-scale * vlin[0], -scale * vlin[1], fn]
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

    for k in range(nj):
        tau_gen[6 + k] = tau_gen[6 + k] + tau[k]

    rhs = [tau_gen[i] - C[i] for i in range(nv)]

    # ---- dense unrolled Cholesky solve (None entries = structural zeros) --
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

    # spatial -> conventional base acceleration, then semi-implicit Euler
    lin = [
        udot[3 + i] + _cross(u[0:3], u[3:6])[i] for i in range(3)
    ]
    udot = udot[0:3] + lin + udot[6:]
    u_new = [u[i] + dt * udot[i] for i in range(nv)]

    new_pos = [base_pos[i] + dt * u_new[3 + i] for i in range(3)]
    # quat integrate: exp(0.5*omega*dt) ⊗ q, normalized (spatial.py:95-110)
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

    # ---- write state ----
    row = 0
    for v in new_pos + new_quat + new_qj + u_new:
        out_ref[row, :] = v
        row += 1

    # ---- write diag: body_pos, body_quat, body_omega, foot_forces,
    # term_force, tau ----
    row = 0
    for b in range(nb):
        for i in range(3):
            diag_ref[row, :] = pos[b][i]
            row += 1
    for b in range(nb):
        for i in range(4):
            diag_ref[row, :] = quat[b][i]
            row += 1
    for b in range(nb):
        for i in range(3):
            diag_ref[row, :] = v_sp[b][i]
            row += 1
    for ff in foot_f:
        for i in range(3):
            diag_ref[row, :] = ff[i]
            row += 1
    for tf in term_f:
        diag_ref[row, :] = tf
        row += 1
    for k in range(nj):
        diag_ref[row, :] = tau[k]
        row += 1


# ---------------------------------------------------------------------------
# host-side wrapper
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


def make_model_consts(model, kp, kd, tau_lim, contact_params, dt):
    """Bake the static model/config into the python-constant dict the
    kernel unrolls over."""
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
    )


def pallas_substep_supported(model, params, terrain, N, dof_rand_on):
    """Static eligibility for the fused kernel (see module docstring)."""
    if jax.default_backend() != "tpu":
        return False
    if not terrain.flat:
        return False
    if params.com is not None or params.inertia is not None:
        return False
    if dof_rand_on:
        return False
    return any(N % blk == 0 for blk in (512, 256, 128))


def build_substep_fn(model, kp, kd, tau_lim, contact_params, dt, N):
    """Returns substep(state_pack, masses, friction, targets) ->
    (state_pack, KernelDiag). state_pack: (N, 7+nj+nv)."""
    from jax.experimental import pallas as pl

    mk = make_model_consts(model, kp, kd, tau_lim, contact_params, dt)
    nj, nb = mk["nj"], mk["nj"] + 1
    nv = nj + 6
    n_state = 7 + nj + nv
    nt = mk["n_term"]
    n_feet = len(mk["foot_bodies"])
    n_diag = nb * 10 + n_feet * 3 + nt + nj
    block = next(b for b in (512, 256, 128) if N % b == 0)

    grid = (N // block,)
    kernel = functools.partial(_substep_kernel, mk=mk)

    @jax.jit
    def substep(state_pack, masses, friction, targets):
        # env-layer layouts: masses (N, nb), friction (N,), targets (N, nj)
        masses = masses.T
        friction = friction[None, :]
        targets = targets.T
        out, diag = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n_state, block), lambda g: (0, g)),
                pl.BlockSpec((nb, block), lambda g: (0, g)),
                pl.BlockSpec((1, block), lambda g: (0, g)),
                pl.BlockSpec((nj, block), lambda g: (0, g)),
            ],
            out_specs=[
                pl.BlockSpec((n_state, block), lambda g: (0, g)),
                pl.BlockSpec((n_diag, block), lambda g: (0, g)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_state, N), state_pack.dtype),
                jax.ShapeDtypeStruct((n_diag, N), state_pack.dtype),
            ],
        )(state_pack, masses, friction, targets)
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
        return out, KernelDiag(
            body_pos, body_quat, body_omega, foot_forces, term_force, tau
        )

    return substep


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
