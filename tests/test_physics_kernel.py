"""Fused Pallas substep kernel vs the XLA engine path (TPU-only).

The kernel is a second f32 implementation of identical math; airborne
accelerations reach thousands of rad/s^2 under PD transients, so
state-update agreement is checked relative to the acceleration scale.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_tpu.config.structs import EnvCfg, XBotLCfg
from humanoid_tpu.env import XBotLEnv
from humanoid_tpu.physics.engine import EnvPhysParams, substep_batch

needs_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas kernel is TPU-only"
)

N = 128


def _setup():
    cfg = XBotLCfg(env=EnvCfg(num_envs=N))
    env = XBotLEnv(cfg)
    s = env.initial_state(jax.random.PRNGKey(0))
    from humanoid_tpu.ops.physics_kernel import build_substep_fn

    fn = build_substep_fn(
        env.model, env.kp, env.kd, env.torque_limits, env.contact_params,
        0.001, N,
    )
    targets = jnp.tile(env.default_dof_pos, (N, 1))

    def xla_sub(st):
        def torque(s_):
            tau = env.kp * (targets - s_.qj) - env.kd * s_.u[:, 6:]
            return jnp.clip(tau, -env.torque_limits, env.torque_limits)

        params = EnvPhysParams(masses=s.masses, friction=s.friction)
        return substep_batch(
            env.model, params, env.terrain, env.contact_params, st,
            torque(st), 0.001,
        )

    return env, s, fn, targets, jax.jit(xla_sub)


@needs_tpu
def test_kernel_matches_xla_airborne():
    from humanoid_tpu.ops.physics_kernel import pack_state, unpack_state

    env, s, fn, targets, xla_sub = _setup()
    ph = s.phys._replace(
        base_pos=s.phys.base_pos.at[:, 2].set(5.0),
        qj=s.phys.qj + 0.1 * jax.random.normal(
            jax.random.PRNGKey(3), s.phys.qj.shape
        ),
        u=0.2 * jax.random.normal(jax.random.PRNGKey(4), s.phys.u.shape),
    )
    r_state, r_diag = xla_sub(ph)
    out, k_diag = fn(pack_state(ph), s.masses, s.friction, targets)
    k_state = unpack_state(out, env.nj)
    # deterministic outputs must match exactly / to FK roundoff
    assert np.allclose(np.asarray(k_diag.tau), np.asarray(r_diag.tau))
    assert np.allclose(
        np.asarray(k_diag.body_pos), np.asarray(r_diag.body_pos), atol=1e-4
    )
    assert np.allclose(
        np.asarray(k_diag.term_force), np.asarray(r_diag.term_force)
    )
    # state update: relative to the acceleration scale of this transient
    udot_scale = float(
        jnp.max(jnp.abs(r_state.u - ph.u)) / 1e-3
    )
    du = float(jnp.max(jnp.abs(k_state.u - r_state.u))) / 1e-3
    assert du / max(udot_scale, 1.0) < 1e-3, (du, udot_scale)


@needs_tpu
def test_kernel_standing_trajectory_tracks_xla():
    from humanoid_tpu.ops.physics_kernel import pack_state, unpack_state

    env, s, fn, targets, xla_sub = _setup()
    ph_x = s.phys
    pk = pack_state(s.phys)
    for _ in range(100):
        pk, _ = fn(pk, s.masses, s.friction, targets)
        ph_x, _ = xla_sub(ph_x)
    k_state = unpack_state(pk, env.nj)
    assert float(jnp.max(jnp.abs(k_state.base_pos - ph_x.base_pos))) < 5e-3
    assert float(jnp.max(jnp.abs(k_state.qj - ph_x.qj))) < 5e-2
    # both remain standing
    assert float(k_state.base_pos[:, 2].min()) > 0.7


@needs_tpu
def test_fused_control_kernel_exact_matches_scanned():
    """build_control_fn(freeze=False) runs the decimation loop on-chip and
    must be bit-identical to scanning build_substep_fn."""
    from humanoid_tpu.ops.physics_kernel import build_control_fn, pack_state
    from humanoid_tpu.physics.engine import (
        control_step_pallas,
        control_step_pallas_fused,
    )

    env, s, fn, targets, _ = _setup()
    ctrl = build_control_fn(
        env.model, env.kp, env.kd, env.torque_limits, env.contact_params,
        0.001, N, 10, freeze=False,
    )
    p1, d1 = control_step_pallas(
        fn, s.phys, s.masses, s.friction, targets, 10, env.nj
    )
    p2, d2 = control_step_pallas_fused(
        ctrl, s.phys, s.masses, s.friction, targets, env.nj
    )
    for a, b in zip(p1, p2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(
        np.asarray(d1.foot_forces), np.asarray(d2.foot_forces)
    )


@needs_tpu
def test_fused_control_kernel_frozen_close_to_exact():
    """freeze=True (one mass-matrix factorization per control step) stays
    within the TGS-approximation tolerance of the exact path over a
    control step."""
    from humanoid_tpu.ops.physics_kernel import build_control_fn
    from humanoid_tpu.physics.engine import control_step_pallas_fused

    env, s, fn, targets, _ = _setup()
    mk_args = (env.model, env.kp, env.kd, env.torque_limits,
               env.contact_params, 0.001, N)
    exact = build_control_fn(*mk_args, 10, freeze=False)
    frozen = build_control_fn(*mk_args, 10, freeze=True)
    p1, _ = control_step_pallas_fused(
        exact, s.phys, s.masses, s.friction, targets, env.nj
    )
    p2, _ = control_step_pallas_fused(
        frozen, s.phys, s.masses, s.friction, targets, env.nj
    )
    assert float(jnp.max(jnp.abs(p1.qj - p2.qj))) < 1e-3
    assert float(jnp.max(jnp.abs(p1.base_pos - p2.base_pos))) < 1e-3
    assert float(jnp.max(jnp.abs(p1.u - p2.u))) < 0.1


def _to_penalty(cfg):
    """Pin the compliant penalty contact model — registered tasks now ship
    PGS (registry flip, VERDICT r3 #2); these pair tests keep covering the
    penalty kernel paths as the A/B."""
    import dataclasses

    return cfg.replace(
        sim=dataclasses.replace(cfg.sim, contact_model="penalty")
    )


def _env_pair(task, n=128, cfg_mut=None):
    """Same task built with and without the fused kernel."""
    import dataclasses

    from humanoid_tpu.utils import registry

    cfg, _ = registry.get_cfgs(task)
    cfg = cfg.replace(env=dataclasses.replace(cfg.env, num_envs=n))
    if cfg_mut is not None:
        cfg = cfg_mut(cfg)
    env_k, _ = registry.make_env(task, env_cfg=cfg)
    cfg_x = cfg.replace(
        sim=dataclasses.replace(cfg.sim, use_pallas_substep=False)
    )
    env_x, _ = registry.make_env(task, env_cfg=cfg_x)
    assert env_k._control_fn is not None
    return env_k, env_x


def _track(env_k, env_x, steps=20):
    """Step both paths with identical keys/actions; return max divergence
    and both median base heights."""
    key = jax.random.PRNGKey(0)
    s_k = env_k.initial_state(key)
    s_x = env_x.initial_state(key)
    step_k = jax.jit(env_k.step)
    step_x = jax.jit(env_x.step)
    kk = jax.random.PRNGKey(1)
    max_dq = 0.0
    for _ in range(steps):
        ka, kk = jax.random.split(kk)
        a = 0.3 * jax.random.normal(ka, (env_k.cfg.env.num_envs, env_k.nj))
        s_k, _ = step_k(s_k, a, ka)
        s_x, _ = step_x(s_x, a, ka)
        max_dq = max(
            max_dq, float(jnp.max(jnp.abs(s_k.phys.qj - s_x.phys.qj)))
        )
    return (
        max_dq,
        float(jnp.median(s_k.phys.base_pos[:, 2])),
        float(jnp.median(s_x.phys.base_pos[:, 2])),
    )


@needs_tpu
def test_kernel_per_env_gains_and_body_rand_tracks_xla():
    """humanoid_ppo_robust (per-env kp/kd/strength/offset + COM/inertia
    randomization) through the kernel's per_env_gains/per_env_body inputs
    stays on the XLA trajectory."""
    env_k, env_x = _env_pair("humanoid_ppo_robust", cfg_mut=_to_penalty)
    max_dq, z_k, z_x = _track(env_k, env_x)
    assert max_dq < 0.05, max_dq
    assert abs(z_k - z_x) < 0.01 and z_k > 0.7


@needs_tpu
def test_kernel_heightfield_planes_track_xla():
    """Heightfield terrain through the kernel's local-tangent-plane contact
    stays on the XLA per-substep-bilinear trajectory."""
    env_k, env_x = _env_pair("humanoid_ppo_terrain", cfg_mut=_to_penalty)
    max_dq, z_k, z_x = _track(env_k, env_x)
    assert max_dq < 0.05, max_dq
    assert abs(z_k - z_x) < 0.01


@needs_tpu
def test_kernel_pgs_matches_xla():
    """The in-kernel block-PGS contact (_pgs_contact) must reproduce the
    XLA solver (physics/pgs.py) on a randomized near-ground batch: same
    Delassus, same sweep order, same cone projection -> tight agreement."""
    import jax.numpy as jnp

    from humanoid_tpu.ops.physics_kernel import (
        build_substep_fn,
        pack_state,
        unpack_state,
    )
    from humanoid_tpu.physics.contact import Terrain
    from humanoid_tpu.physics.engine import PhysState, substep_batch_pgs
    from humanoid_tpu.physics.pgs import PGSParams

    cfg = XBotLCfg(env=EnvCfg(num_envs=N))
    env = XBotLEnv(cfg)
    pgs = PGSParams()
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    ph = PhysState(
        base_pos=jnp.concatenate(
            [jax.random.uniform(ks[0], (N, 2), minval=-0.1, maxval=0.1),
             jax.random.uniform(ks[1], (N, 1), minval=0.82, maxval=0.95)],
            axis=1),
        base_quat=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (N, 1)),
        qj=jax.random.uniform(ks[2], (N, 12), minval=-0.2, maxval=0.2),
        u=jax.random.uniform(ks[3], (N, 18), minval=-0.5, maxval=0.5),
    )
    s = env.initial_state(jax.random.PRNGKey(0))
    targets = jax.random.uniform(ks[4], (N, 12), minval=-0.3, maxval=0.3)
    fn = build_substep_fn(
        env.model, env.kp, env.kd, env.torque_limits, env.contact_params,
        0.001, N, pgs_params=pgs,
    )
    out, k_diag = fn(pack_state(ph), s.masses, s.friction, targets)
    k_state = unpack_state(out, env.nj)

    def torque(s_):
        tau = env.kp * (targets - s_.qj) - env.kd * s_.u[:, 6:]
        return jnp.clip(tau, -env.torque_limits, env.torque_limits)

    params = EnvPhysParams(masses=s.masses, friction=s.friction)
    r_state, r_diag = jax.jit(
        lambda st: substep_batch_pgs(
            env.model, params, Terrain.plane(), env.contact_params, pgs,
            st, torque(st), 0.001,
        )
    )(ph)
    du = float(jnp.max(jnp.abs(k_state.u - r_state.u)))
    assert du < 1e-2, du
    assert float(jnp.max(jnp.abs(k_state.base_pos - r_state.base_pos))) < 1e-5
    # contact forces: agree to 1% of body weight
    w = env.model.total_mass * 9.81
    dff = float(jnp.max(jnp.abs(k_diag.foot_forces - r_diag.foot_forces)))
    assert dff < 0.01 * w, dff


@needs_tpu
def test_kernel_pgs_heightfield_planes_track_xla():
    """PGS contact + heightfield terrain: the kernel's local-tangent-plane
    PGS path (planes branch of _pgs_contact) stays on the XLA
    per-substep-sampled trajectory."""
    import dataclasses

    def to_pgs(cfg):
        return cfg.replace(
            sim=dataclasses.replace(cfg.sim, contact_model="pgs")
        )

    env_k, env_x = _env_pair("humanoid_ppo_terrain", cfg_mut=to_pgs)
    max_dq, z_k, z_x = _track(env_k, env_x)
    assert max_dq < 0.05, max_dq
    assert abs(z_k - z_x) < 0.01
