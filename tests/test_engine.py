"""Engine-level tests: contact + PD + integration (reference behaviors from
humanoid_env.py:639-649, 910-925)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.assets import XBOT_JOINT_ORDER, XBOT_URDF
from humanoid_tpu.physics import load_urdf
from humanoid_tpu.physics.contact import ContactParams, Terrain
from humanoid_tpu.physics.engine import (
    PhysState,
    control_step,
    default_phys_params,
)

KP = jnp.array([200.0, 200, 350, 350, 15, 15] * 2)
KD = jnp.array([10.0] * 12)


@pytest.fixture(scope="module")
def model():
    return load_urdf(XBOT_URDF, joint_order=XBOT_JOINT_ORDER, armature=0.01)


@pytest.fixture(scope="module")
def stepper(model):
    terrain = Terrain.plane()
    cp = ContactParams()
    params = default_phys_params(model)

    def torque_fn(s):
        return jnp.clip(KP * (0.0 - s.qj) - KD * s.u[6:], -170.0, 170.0)

    @jax.jit
    def step(s):
        return control_step(
            model, params, terrain, cp, s, torque_fn, 10, 0.001
        )

    return step


def _init(z=0.886):
    return PhysState(
        base_pos=jnp.array([0.0, 0.0, z]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        qj=jnp.zeros(12),
        u=jnp.zeros(18),
    )


def test_standing_short_horizon(model, stepper):
    """For the first 0.5 s under PD the robot stays up, supports its weight,
    and does not blow up (the long-horizon zero-pose stand is genuinely
    unstable — MuJoCo falls too)."""
    s = _init()
    forces = []
    for i in range(50):
        s, diag = stepper(s)
        forces.append(float(diag.foot_forces[:, 2].sum()))
    assert np.isfinite(np.array(s.base_pos)).all()
    assert float(s.base_pos[2]) > 0.82
    assert float(s.base_quat[0]) > 0.99
    weight = model.total_mass * 9.81
    mean_force = np.mean(forces[20:])
    assert abs(mean_force - weight) < 0.15 * weight


def test_foot_contact_symmetric(stepper):
    """Left/right vertical forces balance at the symmetric pose."""
    s = _init()
    for _ in range(30):
        s, diag = stepper(s)
    fz = np.array(diag.foot_forces[:, 2])
    assert abs(fz[0] - fz[1]) < 0.15 * fz.sum()


def test_no_contact_above_ground(stepper):
    s = _init(z=1.5)
    s, diag = stepper(s)
    assert float(jnp.abs(diag.foot_forces).max()) == 0.0
    assert float(diag.term_force.max()) == 0.0
    # free fall: dz = -0.5 g t^2
    for _ in range(9):
        s, diag = stepper(s)
    assert abs(float(s.base_pos[2]) - (1.5 - 0.5 * 9.81 * 0.1**2)) < 5e-3


def test_termination_contact_when_fallen(model, stepper):
    """A base dropped at ground level registers termination contact force."""
    terrain = Terrain.plane()
    cp = ContactParams()
    params = default_phys_params(model)

    def no_torque(s):
        return jnp.zeros(12)

    s = PhysState(
        base_pos=jnp.array([0.0, 0.0, 0.05]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        qj=jnp.zeros(12),
        u=jnp.zeros(18),
    )
    s, diag = control_step(
        model, params, terrain, cp, s, no_torque, 10, 0.001
    )
    assert float(diag.term_force.max()) > 1.0


def test_batched_vmap(model):
    """The engine vmaps over the env axis (the only parallel dimension,
    SURVEY.md §2 'parallelism')."""
    terrain = Terrain.plane()
    cp = ContactParams()
    params = default_phys_params(model)

    def torque_fn(s):
        return jnp.clip(KP * (0.0 - s.qj) - KD * s.u[6:], -170.0, 170.0)

    def one(s):
        return control_step(model, params, terrain, cp, s, torque_fn, 10, 0.001)

    N = 4
    zs = jnp.array([0.886, 0.9, 1.0, 1.2])
    batch = PhysState(
        base_pos=jnp.stack([jnp.array([0.0, 0.0, z]) for z in zs]),
        base_quat=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (N, 1)),
        qj=jnp.zeros((N, 12)),
        u=jnp.zeros((N, 18)),
    )
    step = jax.jit(jax.vmap(one))
    s2 = batch
    for _ in range(5):
        s2, diag = step(s2)
    assert s2.base_pos.shape == (N, 3)
    assert diag.foot_forces.shape == (N, 2, 3)
    assert np.isfinite(np.array(s2.base_pos)).all()
    # grounded envs carry load; the env dropped from 1.2 m is still airborne
    fz = np.array(diag.foot_forces[:, :, 2].sum(axis=1))
    assert fz[0] > 100.0 and fz[3] == 0.0


def test_terrain_sampling():
    t = Terrain(
        height=jnp.arange(16.0).reshape(4, 4) * 0.1,
        horizontal_scale=1.0,
        border=0.0,
    )
    # exact at grid points, linear between
    assert abs(float(t.sample(jnp.array([1.0, 2.0]))) - 0.6) < 1e-6
    assert abs(float(t.sample(jnp.array([1.5, 2.0]))) - 0.8) < 1e-6
    # min3 is conservative
    assert float(t.sample_min3(jnp.array([1.5, 2.0]))) <= 0.6 + 1e-6


def test_terrain_sample_with_grad():
    """sample_with_grad returns the bilinear height and its exact gradient
    (the local tangent plane the fused kernel's heightfield path uses)."""
    key = jax.random.PRNGKey(7)
    t = Terrain(
        height=jax.random.uniform(key, (8, 8)),
        horizontal_scale=0.5,
        border=1.0,
    )
    # points strictly inside cells (the bilinear gradient is discontinuous
    # across cell boundaries, so FD checks must not straddle them)
    xy = jnp.array([[0.3, 0.7], [1.1, -0.2], [0.1, 0.05]])
    h, gx, gy = t.sample_with_grad(xy)
    assert np.allclose(np.asarray(h), np.asarray(t.sample(xy)), atol=1e-6)
    eps = 1e-4
    dx = jnp.array([eps, 0.0])
    dy = jnp.array([0.0, eps])
    gx_fd = (t.sample(xy + dx) - t.sample(xy - dx)) / (2 * eps)
    gy_fd = (t.sample(xy + dy) - t.sample(xy - dy)) / (2 * eps)
    assert np.allclose(np.asarray(gx), np.asarray(gx_fd), atol=1e-3)
    assert np.allclose(np.asarray(gy), np.asarray(gy_fd), atol=1e-3)
    # flat terrain: all zeros
    tf = Terrain.plane()
    h0, gx0, gy0 = tf.sample_with_grad(xy)
    assert not np.any(np.asarray(h0)) and not np.any(np.asarray(gx0))
