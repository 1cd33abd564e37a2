"""Contact-phase golden trajectories vs MuJoCo (VERDICT r1 next #3).

Round 1's MuJoCo goldens were contact-free; these run the full contact
pipeline — penalty normal + regularized Coulomb friction (contact.py) vs
MuJoCo's constraint solver — on the same exported model (mjcf_export,
foot boxes + plane, friction 1.0) under identical 1 kHz PD torques.

Tolerances are calibrated, not aspirational: the zero-pose stand is
marginally stable (SURVEY.md §6 notes the authors' own MuJoCo blow-up
log), so trajectory error grows Lyapunov-style — measured ~2x per 0.1 s
after ~0.5 s in BOTH engine pairings. The goldens therefore check
(a) tight trajectory agreement over the first half second, and
(b) the behaviorally-relevant contact quantities the reward bank consumes
(weight support, impact transient, 5 N stance masks) over longer spans.
Measured baselines (this machine, fp32):
  stand  t=0.5 s: |dpos|=0.008, |dqj|=0.062, sum fz ours/mj = 496/517 N
  drop   t=0.5 s: |dpos|=0.019; impact peak 966 vs 819 N; settle ~ weight
  gait   t=0.5 s: |dpos|=0.032; stance masks agree at every 0.1 s sample
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from humanoid_tpu.assets import XBOT_JOINT_ORDER, XBOT_URDF
from humanoid_tpu.physics import load_urdf
from humanoid_tpu.physics.contact import ContactParams, Terrain
from humanoid_tpu.physics.engine import (
    PhysState,
    control_step,
    default_phys_params,
)
from humanoid_tpu.physics.mjcf_export import model_to_mjcf

pytestmark = pytest.mark.slow  # MuJoCo golden rollouts: 25-82 s each on 2 CPU cores

KP = np.array([200.0, 200, 350, 350, 15, 15] * 2)
KD = np.array([10.0] * 12)
STANCE_N = 5.0          # stance threshold the rewards use (humanoid_env.py:833)


@pytest.fixture(scope="module")
def model():
    return load_urdf(XBOT_URDF, joint_order=XBOT_JOINT_ORDER, armature=0.01)


@pytest.fixture(scope="module")
def mj_model(model):
    return mujoco.MjModel.from_xml_string(
        model_to_mjcf(model, with_floor=True, friction=1.0)
    )


@pytest.fixture(scope="module")
def stepper(model):
    terrain = Terrain.plane()
    cp = ContactParams()
    params = default_phys_params(model)
    kp, kd = jnp.asarray(KP), jnp.asarray(KD)

    @jax.jit
    def ctrl_step(s, tgt):
        def torque_fn(st):
            return jnp.clip(kp * (tgt - st.qj) - kd * st.u[6:], -170.0, 170.0)

        return control_step(model, params, terrain, cp, s, torque_fn, 10,
                            0.001)

    return ctrl_step


def run_ours(stepper, z0, target_fn, seconds):
    """Returns (T, 21) rows: base_pos(3) quat(4) qj(12) foot_fz(2)."""
    s = PhysState(
        base_pos=jnp.array([0.0, 0.0, z0]),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        qj=jnp.zeros(12),
        u=jnp.zeros(18),
    )
    rows = []
    for i in range(int(seconds / 0.01)):
        s, d = stepper(s, jnp.asarray(target_fn(i * 0.01)))
        fz = np.asarray(d.foot_forces)[:, 2]
        rows.append(np.concatenate([
            np.asarray(s.base_pos), np.asarray(s.base_quat),
            np.asarray(s.qj), fz,
        ]))
    return np.array(rows)


def run_mj(m, z0, target_fn, seconds):
    d = mujoco.MjData(m)
    d.qpos[:3] = [0, 0, z0]
    d.qpos[3] = 1.0
    foot_geoms = [
        g for g in range(m.ngeom)
        if m.geom_bodyid[g] != 0
        and m.geom_type[g] == mujoco.mjtGeom.mjGEOM_BOX
    ]
    rows = []
    for i in range(int(seconds / 0.001)):
        tgt = target_fn((i // 10) * 0.01)
        tau = np.clip(KP * (tgt - d.qpos[7:]) - KD * d.qvel[6:], -170, 170)
        d.ctrl[:] = tau
        mujoco.mj_step(m, d)
        if i % 10 == 9:
            fz = np.zeros(2)
            for ci in range(d.ncon):
                c = d.contact[ci]
                f6 = np.zeros(6)
                mujoco.mj_contactForce(m, d, ci, f6)
                fz_w = abs((f6[0] * c.frame[0:3])[2])
                for k, g in enumerate(foot_geoms):
                    if c.geom1 == g or c.geom2 == g:
                        fz[k] += fz_w
            rows.append(np.concatenate([d.qpos[:3], d.qpos[3:7],
                                        d.qpos[7:], fz]))
    return np.array(rows)


def _gait_targets(t):
    """The reference gait shape (compute_ref_state, humanoid_env.py:717-744):
    sinusoidal hip-pitch/knee/ankle-pitch, left on sin<=0, right on sin>=0,
    0.64 s cycle."""
    phase = 2 * np.pi * t / 0.64
    sin = np.sin(phase)
    tgt = np.zeros(12)
    sl, sr = min(sin, 0.0), max(sin, 0.0)
    tgt[2], tgt[3], tgt[4] = sl * 0.3, sl * 0.6, sl * 0.3
    tgt[8], tgt[9], tgt[10] = -sr * 0.3, -sr * 0.6, -sr * 0.3
    return tgt


def test_standing_contact_golden(model, mj_model, stepper):
    """2 s PD stand: tight trajectory match for 0.5 s, weight support and
    both-feet stance for the full span in both engines."""
    a = run_ours(stepper, 0.886, lambda t: np.zeros(12), 2.0)
    b = run_mj(mj_model, 0.886, lambda t: np.zeros(12), 2.0)
    k5 = 49   # t = 0.5 s
    assert np.abs(a[: k5 + 1, :3] - b[: k5 + 1, :3]).max() < 0.02
    assert np.abs(a[: k5 + 1, 7:19] - b[: k5 + 1, 7:19]).max() < 0.12
    w = model.total_mass * 9.81
    # weight support: mean total normal force ~ weight in both (after the
    # settling transient), and every step keeps both feet in stance
    for traj in (a, b):
        fz = traj[20:k5, 19:21].sum(axis=1)
        assert abs(fz.mean() - w) < 0.10 * w
        assert (traj[2:k5, 19:21] > STANCE_N).all()
    # force curves track each other through 1 s (2 s state is chaotic)
    fa, fb = a[20:100, 19:21].sum(axis=1), b[20:100, 19:21].sum(axis=1)
    assert np.abs(fa - fb).mean() < 0.12 * w


def test_drop_landing_golden(model, mj_model, stepper):
    """Drop from 5 cm: identical touchdown step, comparable impact
    transient, settles to weight in both."""
    a = run_ours(stepper, 0.95, lambda t: np.zeros(12), 1.0)
    b = run_mj(mj_model, 0.95, lambda t: np.zeros(12), 1.0)
    touch_a = int(np.argmax(a[:, 19:21].sum(axis=1) > STANCE_N))
    touch_b = int(np.argmax(b[:, 19:21].sum(axis=1) > STANCE_N))
    assert abs(touch_a - touch_b) <= 2     # within 20 ms at 100 Hz sampling
    w = model.total_mass * 9.81
    peak_a = a[:, 19:21].sum(axis=1).max()
    peak_b = b[:, 19:21].sum(axis=1).max()
    # impact transient: both peak well above weight, within 60% of each
    # other (penalty model is measured ~18% stiffer than MuJoCo's solver)
    assert peak_a > 1.2 * w and peak_b > 1.2 * w
    assert 0.6 < peak_a / peak_b < 1.6
    # settle to weight by 0.4-0.5 s
    for traj in (a, b):
        fz = traj[40:50, 19:21].sum(axis=1)
        assert abs(fz.mean() - w) < 0.15 * w
    # trajectory agreement through the landing (first 0.5 s)
    assert np.abs(a[:50, :3] - b[:50, :3]).max() < 0.04


def test_gait_snippet_golden(model, mj_model, stepper):
    """One 0.64 s reference-gait cycle: trajectory match for half a cycle,
    and the 5 N stance masks (what feet_contact_number/gait rewards see)
    agree for >=85% of control steps over the full cycle."""
    a = run_ours(stepper, 0.886, _gait_targets, 0.64)
    b = run_mj(mj_model, 0.886, _gait_targets, 0.64)
    assert np.abs(a[:32, :3] - b[:32, :3]).max() < 0.06
    stance_a = a[:, 19:21] > STANCE_N
    stance_b = b[:, 19:21] > STANCE_N
    agree = (stance_a == stance_b).mean()
    assert agree >= 0.85, f"stance agreement {agree:.2f}"
    # during the first swing window (steps 12..20 of the 64-step cycle)
    # exactly one leg unloads while the other carries the robot — and it is
    # the SAME leg in both engines
    def swing_foot(traj):
        fz = traj[12:20, 19:21]
        swing = int(np.argmin(fz.mean(axis=0)))
        assert fz[:, swing].max() < 30.0, "swing foot should unload"
        assert fz[:, 1 - swing].min() > 100.0, "stance foot carries the load"
        return swing

    assert swing_foot(a) == swing_foot(b)
