"""Quaternion and spatial (6D) algebra primitives.

Conventions used throughout the physics layer:
  * Quaternions are (w, x, y, z), unit norm, representing rotation of vectors
    from the body frame into the world frame: v_world = R(q) @ v_body.
  * Spatial (Plücker) vectors are ordered [angular(3); linear(3)]
    (Featherstone convention). Motion vectors: [omega; v], force vectors:
    [torque; force].
  * Euler extraction follows the reference stack's roll/pitch/yaw convention
    (isaacgym torch_utils get_euler_xyz as used by
    /root/reference/humanoid/envs/custom/humanoid_env.py:787) wrapped to
    (-pi, pi].

Everything here is shape-polymorphic: functions operate on trailing axes so
they can be freely vmapped over the env axis.
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(a, b):
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (body -> world when q is a body pose)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inverse(q, v):
    """Rotate v by the inverse of q (world -> body)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v - qw * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis, angle):
    """Unit quaternion for rotation of `angle` radians about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_mat(q):
    """3x3 rotation matrix from quaternion (acts on column vectors)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_exp_approx(omega_dt):
    """Quaternion exponential of a small rotation vector (exact formula,
    safe near zero)."""
    angle = jnp.linalg.norm(omega_dt, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-style safe division
    small = angle < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([jnp.cos(half), omega_dt * k], axis=-1)


def quat_integrate(q, omega_world, dt):
    """Integrate orientation: q(t+dt) = exp(0.5*omega_world*dt) ⊗ q."""
    dq = quat_exp_approx(omega_world * dt)
    return quat_normalize(quat_mul(dq, q))


def quat_to_euler_xyz(q):
    """Roll/pitch/yaw (extrinsic x-y-z) from quaternion, wrapped to (-pi, pi].

    Matches the semantics of the reference's get_euler_xyz + wrap used for
    base_euler_xyz observations (humanoid_env.py:787)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    e = jnp.stack([roll, pitch, yaw], axis=-1)
    return wrap_to_pi(e)


def quat_from_euler_xyz(roll, pitch, yaw):
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def wrap_to_pi(a):
    """Wrap angles to (-pi, pi] (reference utils/math.py:47)."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def quat_apply_yaw(q, v):
    """Rotate v by only the yaw component of q (utils/math.py:39-43).
    q is wxyz here, so the x/y components (indices 1,2) are zeroed."""
    q_yaw = q.at[..., 1:3].set(0.0)
    return quat_rotate(quat_normalize(q_yaw), v)


def rand_sqrt_float(key, lower, upper, shape):
    """U-shaped (sqrt-warped) uniform in [lower, upper] — the jax.random
    equivalent of torch_rand_sqrt_float (utils/math.py:52-57), used for
    edge-biased initial-state sampling."""
    import jax

    r = 2.0 * jax.random.uniform(key, shape) - 1.0
    r = jnp.where(r < 0.0, -jnp.sqrt(-r), jnp.sqrt(r))
    return (upper - lower) * (r + 1.0) / 2.0 + lower


def rpy_to_mat(rpy):
    """URDF fixed-axis RPY -> rotation matrix: R = Rz(yaw) Ry(pitch) Rx(roll)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Rotation matrix -> quaternion (w,x,y,z), branch-free (Shepperd)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # four candidate constructions, pick the numerically best
    qw = jnp.sqrt(jnp.maximum(1 + tr, 0.0)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2], 0.0)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2], 0.0)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2], 0.0)) / 2
    qx = jnp.where(m[..., 2, 1] - m[..., 1, 2] < 0, -qx, qx)
    qy = jnp.where(m[..., 0, 2] - m[..., 2, 0] < 0, -qy, qy)
    qz = jnp.where(m[..., 1, 0] - m[..., 0, 1] < 0, -qz, qz)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Spatial algebra ([angular; linear] Plücker coordinates in a common frame)
# ---------------------------------------------------------------------------

def skew(v):
    """3x3 cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def crm(v):
    """Spatial cross product (motion x motion): v ×̂ = [[w̃,0],[ṽ,w̃]]."""
    w = skew(v[..., 0:3])
    l = skew(v[..., 3:6])
    zero = jnp.zeros_like(w)
    top = jnp.concatenate([w, zero], axis=-1)
    bot = jnp.concatenate([l, w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Spatial cross product (motion x force): v ×̂* = -crm(v)^T."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_inertia_at(mass, com_world, inertia_world, origin):
    """6x6 spatial inertia of a body, expressed in a world-aligned Plücker
    frame with origin `origin`.

    mass: (), com_world: (3,) world com position, inertia_world: (3,3) rotated
    inertia about the com, origin: (3,) frame origin.
    """
    r = com_world - origin
    rx = skew(r)
    top = jnp.concatenate(
        [inertia_world + mass * rx @ rx.T, mass * rx], axis=-1
    )
    bot = jnp.concatenate([mass * rx.T, mass * jnp.eye(3)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
