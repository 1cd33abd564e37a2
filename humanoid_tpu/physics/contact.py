"""Contact: foot/terrain collision and regularized friction forces.

Replaces PhysX's contact pipeline (gym.simulate + net_contact_force tensors,
/root/reference/humanoid/envs/custom/humanoid_env.py:645,774) with a smooth,
jit-friendly compliant model:

  * collision geometry = 4 bottom corners of each foot's collision box, plus
    proxy spheres on termination bodies (base_link), vs a heightfield
    (a plane is the zero heightfield);
  * normal force: spring-damper  f_n = relu(-kn*phi - cn*v_n) gated on
    penetration (phi < 0);
  * friction: Coulomb cone with velocity regularization
    f_t = -mu*f_n * v_t / sqrt(|v_t|^2 + v_reg^2).

This keeps every env a fixed-shape computation (no contact counts, no
branching) — the TPU-native answer to "batched contact solve" for this
robot's needs; a per-env QP solver can slot in behind the same interface.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .model import RobotModel
from .spatial import quat_rotate


class ContactParams(NamedTuple):
    # stiffness/damping chosen for explicit integration at 1 kHz with the
    # XBot's ~0.34 kg feet: per-point omega*dt ~ 0.45, cn*dt/m ~ 0.8.
    kn: float = 2.0e4       # normal stiffness [N/m]
    cn: float = 80.0        # normal damping [N s/m]
    v_reg: float = 0.05     # friction regularization velocity [m/s]


class Terrain(NamedTuple):
    """Global heightfield shared by all envs (plane == zero grid).

    height[i, j] is terrain height at x = i*hs - border, y = j*hs - border.
    """
    height: jnp.ndarray        # (H, W) meters
    horizontal_scale: float
    border: float

    @staticmethod
    def flat() -> "Terrain":
        return Terrain(
            height=jnp.zeros((2, 2)), horizontal_scale=1000.0, border=1000.0
        )

    def sample(self, xy):
        """Bilinear height at world xy (..., 2)."""
        fx = (xy[..., 0] + self.border) / self.horizontal_scale
        fy = (xy[..., 1] + self.border) / self.horizontal_scale
        H, W = self.height.shape
        fx = jnp.clip(fx, 0.0, H - 1.001)
        fy = jnp.clip(fy, 0.0, W - 1.001)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = fx - x0
        ty = fy - y0
        h00 = self.height[x0, y0]
        h10 = self.height[x0 + 1, y0]
        h01 = self.height[x0, y0 + 1]
        h11 = self.height[x0 + 1, y0 + 1]
        return (
            h00 * (1 - tx) * (1 - ty)
            + h10 * tx * (1 - ty)
            + h01 * (1 - tx) * ty
            + h11 * tx * ty
        )

    def sample_min3(self, xy):
        """min of 3 neighboring cells — matches the reference's conservative
        height probe (humanoid_env.py:973-979)."""
        fx = (xy[..., 0] + self.border) / self.horizontal_scale
        fy = (xy[..., 1] + self.border) / self.horizontal_scale
        H, W = self.height.shape
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, H - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, W - 2)
        h1 = self.height[x0, y0]
        h2 = self.height[x0 + 1, y0]
        h3 = self.height[x0, y0 + 1]
        return jnp.minimum(jnp.minimum(h1, h2), h3)


class ContactInfo(NamedTuple):
    tau_gen: jnp.ndarray       # (nv,) generalized contact force
    point_forces: jnp.ndarray  # (P, 3) world forces at foot points
    term_force: jnp.ndarray    # (nt,) normal force magnitude on proxy spheres


def _point_forces(pts, vels, heights, mu, params: ContactParams):
    """Penalty normal + regularized Coulomb friction for point contacts.

    pts/vels: (P,3) world positions/velocities; heights: (P,) terrain height.
    """
    phi = pts[..., 2] - heights                       # penetration depth (<0)
    pen = phi < 0.0
    fn = jnp.maximum(
        0.0, -params.kn * phi - params.cn * vels[..., 2]
    ) * pen
    vt = vels[..., 0:2]
    speed = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + params.v_reg**2)
    ft = -(mu * fn / speed)[..., None] * vt
    return jnp.concatenate([ft, fn[..., None]], axis=-1)


def contact_forces(
    model: RobotModel,
    body_pos,
    body_quat,
    v_sp,
    terrain: Terrain,
    mu,
    params: ContactParams,
) -> ContactInfo:
    """All contact forces for one env, as generalized forces.

    body_pos/body_quat: (nb,·) FK results; v_sp: (nb,6) spatial velocities in
    the Plücker-at-base frame; mu: per-env friction coefficient.
    """
    A = body_pos[0]
    pt_body, pt_off = model.contact_points()
    pt_body = jnp.asarray(pt_body)
    pt_off = jnp.asarray(pt_off)

    # world positions / velocities of foot points
    pq = body_quat[pt_body]
    pts = body_pos[pt_body] + quat_rotate(pq, pt_off)        # (P,3)
    w = v_sp[pt_body, 0:3]
    vA = v_sp[pt_body, 3:6]
    vel = vA + jnp.cross(w, pts - A)

    heights = terrain.sample(pts[..., 0:2])
    f = _point_forces(pts, vel, heights, mu, params)          # (P,3)

    # termination proxy spheres (base etc.): sphere-lowest-point contact
    tb = jnp.asarray(model.term_sphere_body)
    toff = jnp.asarray(model.term_sphere_offset)
    trad = jnp.asarray(model.term_sphere_radius)
    tc = body_pos[tb] + quat_rotate(body_quat[tb], toff)
    tlow = tc - jnp.stack(
        [jnp.zeros_like(trad), jnp.zeros_like(trad), trad], axis=-1
    )
    tw = v_sp[tb, 0:3]
    tv = v_sp[tb, 3:6] + jnp.cross(tw, tlow - A)
    th = terrain.sample(tlow[..., 0:2])
    tf = _point_forces(tlow, tv, th, mu, params)              # (nt,3)

    # map point forces to generalized forces: tau = sum_k Jp_k^T f_k.
    # Exploit the Plücker structure instead of materializing Jacobians:
    # spatial force at A is [ (x-A) x f ; f ], projected on each ancestor
    # joint screw and the base unit screws.
    all_pts = jnp.concatenate([pts, tlow], axis=0)
    all_f = jnp.concatenate([f, tf], axis=0)
    all_body = jnp.concatenate([pt_body, tb], axis=0)

    n_mom = jnp.cross(all_pts - A, all_f)                     # (K,3)
    # base rows: [sum n_mom ; sum f]
    tau_base = jnp.concatenate([n_mom.sum(0), all_f.sum(0)])
    # joint rows: screw of joint j = [w_j ; (p_j - A) x w_j]
    w_j = jnp.stack(
        [
            quat_rotate(body_quat[k + 1], jnp.asarray(model.joint_axis[k]))
            for k in range(model.nj)
        ]
    )                                                          # (nj,3)
    anchor = body_pos[1:] - A                                  # (nj,3)
    anc = jnp.asarray(model.ancestor_matrix())                 # (nb,nj)
    mask = anc[all_body]                                       # (K,nj)
    # tau_j = sum_k mask * ( n_mom_k . w_j + f_k . (anchor_j x w_j) )
    lin_j = jnp.cross(anchor, w_j)                             # (nj,3)
    contrib = n_mom @ w_j.T + all_f @ lin_j.T                  # (K,nj)
    tau_j = jnp.sum(mask * contrib, axis=0)

    return ContactInfo(
        tau_gen=jnp.concatenate([tau_base, tau_j]),
        point_forces=f,
        term_force=tf[..., 2],
    )
