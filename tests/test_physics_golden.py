"""Golden-trajectory tests of the physics core against MuJoCo.

Strategy (SURVEY.md §4): build a MuJoCo model *from our compiled RobotModel*
(mjcf_export) so the comparison isolates our CRBA/RNEA math from asset
differences, then check FK, mass matrix, and contact-free forward dynamics.
A looser sanity check runs against the reference MJCF (which genuinely
deviates from the URDF: merged motor links, retuned hand masses).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from humanoid_tpu.assets import XBOT_JOINT_ORDER, XBOT_URDF
from humanoid_tpu.physics.dynamics import compute_dynamics, forward_accel
from humanoid_tpu.physics.kinematics import fk
from humanoid_tpu.physics.mjcf_export import model_to_mjcf
from humanoid_tpu.physics.spatial import quat_from_euler_xyz, quat_to_mat
from humanoid_tpu.physics.urdf import load_urdf


@pytest.fixture(scope="module")
def x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.fixture(scope="module")
def model(x64):
    return load_urdf(XBOT_URDF, joint_order=XBOT_JOINT_ORDER)


@pytest.fixture(scope="module")
def mj_pair(model):
    m = mujoco.MjModel.from_xml_string(model_to_mjcf(model))
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    return m, mujoco.MjData(m)


def _vel_map(bq):
    """T with u_ours = T @ u_mujoco (mj free joint: [v_world, omega_body])."""
    R = np.array(quat_to_mat(jnp.array(bq)))
    T = np.zeros((18, 18))
    T[0:3, 3:6] = R
    T[3:6, 0:3] = np.eye(3)
    T[6:, 6:] = np.eye(12)
    return T


def _random_state(rng):
    base_pos = rng.uniform(-1, 1, 3) + np.array([0, 0, 1.5])
    bq = np.array(quat_from_euler_xyz(*rng.uniform(-1, 1, 3)))
    qj = rng.uniform(-0.5, 0.5, 12)
    return base_pos, bq, qj


def test_model_compile(model):
    assert model.nj == 12 and model.nb == 13 and model.nv == 18
    assert abs(model.total_mass - 53.036) < 0.01
    assert model.parent[1] == 0 and model.parent[7] == 0  # two chains off base
    assert len(model.foot_bodies) == 2 and len(model.knee_bodies) == 2


def test_fk_matches_mujoco(model, mj_pair):
    m, d = mj_pair
    rng = np.random.RandomState(0)
    ids = [
        mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, n)
        for n in model.body_names
    ]
    for _ in range(5):
        base_pos, bq, qj = _random_state(rng)
        d.qpos[:3], d.qpos[3:7], d.qpos[7:] = base_pos, bq, qj
        mujoco.mj_forward(m, d)
        bp, bqs = fk(model, jnp.array(base_pos), jnp.array(bq), jnp.array(qj))
        np.testing.assert_allclose(d.xpos[ids], np.array(bp), atol=1e-9)
        qe = np.minimum(
            np.abs(d.xquat[ids] - np.array(bqs)).max(axis=1),
            np.abs(d.xquat[ids] + np.array(bqs)).max(axis=1),
        )
        assert qe.max() < 1e-9


def test_mass_matrix_matches_mujoco(model, mj_pair):
    m, d = mj_pair
    rng = np.random.RandomState(1)
    for _ in range(3):
        base_pos, bq, qj = _random_state(rng)
        d.qpos[:3], d.qpos[3:7], d.qpos[7:] = base_pos, bq, qj
        d.qvel[:] = 0
        mujoco.mj_forward(m, d)
        T = _vel_map(bq)
        cache = compute_dynamics(
            model, jnp.array(base_pos), jnp.array(bq), jnp.array(qj),
            jnp.zeros(18),
        )
        Mmj = np.zeros((18, 18))
        mujoco.mj_fullM(m, d, Mmj)
        np.testing.assert_allclose(
            T.T @ np.array(cache.M) @ T, Mmj, atol=5e-6
        )


def test_forward_dynamics_matches_mujoco(model, mj_pair):
    """Gravity + Coriolis + applied torque accelerations, contact-free."""
    m, d = mj_pair
    rng = np.random.RandomState(2)
    for _ in range(5):
        base_pos, bq, qj = _random_state(rng)
        u_mj = rng.uniform(-1, 1, 18)
        ctrl = rng.uniform(-20, 20, 12)
        d.qpos[:3], d.qpos[3:7], d.qpos[7:] = base_pos, bq, qj
        d.qvel[:] = u_mj
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        T = _vel_map(bq)
        u = T @ u_mj
        cache = compute_dynamics(
            model, jnp.array(base_pos), jnp.array(bq), jnp.array(qj),
            jnp.array(u),
        )
        tau = jnp.concatenate([jnp.zeros(6), jnp.array(ctrl)])
        udot = np.array(forward_accel(cache, tau, jnp.array(u)))
        R = T[0:3, 3:6]
        acc = np.concatenate([R @ d.qacc[3:6], d.qacc[0:3], d.qacc[6:]])
        # MuJoCo's fullinertia -> principal-axes round trip is only ~1e-7
        # relative; scale tolerance by acceleration magnitude.
        np.testing.assert_allclose(
            udot, acc, atol=1e-5 * max(1.0, np.abs(acc).max())
        )


def test_reference_mjcf_loose_agreement(model):
    """The shipped XBot MJCF differs from the URDF (~0.33 kg); dynamics should
    still agree to a few percent — the sim2sim transfer premise."""
    from humanoid_tpu.assets import prepare_mujoco_xml

    m = mujoco.MjModel.from_xml_path(prepare_mujoco_xml())
    m.dof_armature[:] = 0
    m.dof_damping[:] = 0
    m.dof_frictionloss[:] = 0
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    d = mujoco.MjData(m)
    rng = np.random.RandomState(3)
    base_pos, bq, qj = _random_state(rng)
    u_mj = rng.uniform(-0.5, 0.5, 18)
    bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "base_link")
    d.qpos[:3] = base_pos - m.body_pos[bid]
    d.qpos[3:7], d.qpos[7:] = bq, qj
    d.qvel[:] = u_mj
    mujoco.mj_forward(m, d)
    T = _vel_map(bq)
    u = T @ u_mj
    cache = compute_dynamics(
        model, jnp.array(base_pos), jnp.array(bq), jnp.array(qj), jnp.array(u)
    )
    udot = np.array(forward_accel(cache, jnp.zeros(18), jnp.array(u)))
    R = T[0:3, 3:6]
    acc = np.concatenate([R @ d.qacc[3:6], d.qacc[0:3], d.qacc[6:]])
    assert np.abs(udot - acc).max() < 0.12 * max(1.0, np.abs(acc).max())
