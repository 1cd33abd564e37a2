"""Unit tests for quaternion / spatial algebra primitives."""
import jax.numpy as jnp
import numpy as np

from humanoid_tpu.physics.spatial import (
    crf,
    crm,
    mat_to_quat,
    quat_from_axis_angle,
    quat_from_euler_xyz,
    quat_integrate,
    quat_mul,
    quat_rotate,
    quat_rotate_inverse,
    quat_to_euler_xyz,
    quat_to_mat,
    rpy_to_mat,
    skew,
    wrap_to_pi,
)


def test_quat_rotate_roundtrip():
    rng = np.random.RandomState(0)
    q = np.array(quat_from_euler_xyz(*rng.uniform(-3, 3, 3)))
    v = rng.standard_normal(3)
    w = quat_rotate(jnp.array(q), jnp.array(v))
    back = quat_rotate_inverse(jnp.array(q), w)
    np.testing.assert_allclose(np.array(back), v, atol=1e-5)


def test_quat_mat_consistency():
    rng = np.random.RandomState(1)
    for _ in range(5):
        q = np.array(quat_from_euler_xyz(*rng.uniform(-3, 3, 3)))
        v = rng.standard_normal(3)
        np.testing.assert_allclose(
            np.array(quat_to_mat(jnp.array(q)) @ v),
            np.array(quat_rotate(jnp.array(q), jnp.array(v))),
            atol=1e-5,
        )
        q2 = np.array(mat_to_quat(quat_to_mat(jnp.array(q))))
        assert min(np.abs(q2 - q).max(), np.abs(q2 + q).max()) < 1e-5


def test_euler_roundtrip():
    rng = np.random.RandomState(2)
    for _ in range(5):
        rpy = rng.uniform(-1.2, 1.2, 3)  # away from gimbal lock
        q = quat_from_euler_xyz(*rpy)
        np.testing.assert_allclose(np.array(quat_to_euler_xyz(q)), rpy, atol=1e-5)


def test_rpy_matches_quat():
    rng = np.random.RandomState(3)
    rpy = rng.uniform(-2, 2, 3)
    np.testing.assert_allclose(
        np.array(rpy_to_mat(jnp.array(rpy))),
        np.array(quat_to_mat(quat_from_euler_xyz(*rpy))),
        atol=1e-5,
    )


def test_wrap_to_pi():
    a = jnp.array([0.0, 3.2, -3.2, 7.0, -7.0])
    w = np.array(wrap_to_pi(a))
    assert (np.abs(w) <= np.pi + 1e-6).all()
    np.testing.assert_allclose(np.cos(w), np.cos(np.array(a)), atol=1e-5)
    np.testing.assert_allclose(np.sin(w), np.sin(np.array(a)), atol=1e-5)


def test_quat_integrate_matches_axis_angle():
    axis = jnp.array([0.0, 0.0, 1.0])
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    q = q0
    for _ in range(100):
        q = quat_integrate(q, axis * 2.0, 0.005)  # 2 rad/s for 0.5 s
    expected = quat_from_axis_angle(axis, jnp.array(1.0))
    assert min(
        np.abs(np.array(q - expected)).max(),
        np.abs(np.array(q + expected)).max(),
    ) < 1e-5


def test_spatial_cross_products():
    rng = np.random.RandomState(4)
    v = rng.standard_normal(6)
    u = rng.standard_normal(6)
    # crm acts like the 6D motion cross product: check the skew identity
    m = np.array(crm(jnp.array(v)))
    np.testing.assert_allclose(m[0:3, 0:3], np.array(skew(jnp.array(v[:3]))), atol=1e-6)
    np.testing.assert_allclose(m[3:6, 3:6], np.array(skew(jnp.array(v[:3]))), atol=1e-6)
    np.testing.assert_allclose(m[3:6, 0:3], np.array(skew(jnp.array(v[3:]))), atol=1e-6)
    # crf = -crm^T
    np.testing.assert_allclose(
        np.array(crf(jnp.array(v))), -m.T, atol=1e-6
    )
    # duality: (v x m) . f = -m . (v x* f) -- Featherstone (2.9)
    f = rng.standard_normal(6)
    lhs = (m @ u) @ f
    rhs = -u @ (np.array(crf(jnp.array(v))) @ f)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)
