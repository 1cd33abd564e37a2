"""Deployment-layer tests: export/npz policy, ONNX reader, sim2sim harness,
symmetry matrices, gait tool."""
import os

import jax
import numpy as np
import pytest

from humanoid_tpu.algo.networks import ActorCritic, init_params
from humanoid_tpu.algo.symmetry import xbot_perm_matrices
from humanoid_tpu.deploy.export import export_policy_npz
from humanoid_tpu.deploy.npz_policy import NpzPolicy
from humanoid_tpu.utils.calculate_gait import evaluate, solve_quintic_swing

ONNX_PATH = "/root/reference/humanoid/OnnxTest.onnx"


def test_export_roundtrip(tmp_path):
    net = ActorCritic(num_actions=12)
    params = init_params(jax.random.PRNGKey(0), net, 705, 219)
    path = export_policy_npz(params, str(tmp_path / "p.npz"))
    pol = NpzPolicy(path)
    obs = np.random.RandomState(0).randn(3, 705).astype(np.float32)
    out_np = pol(obs)
    out_jax = np.array(net.apply(params, obs, method="act_mean"))
    np.testing.assert_allclose(out_np, out_jax, atol=2e-5)
    vel = NpzPolicy(path, prefix="vel")
    assert vel(obs).shape == (3, 3)


@pytest.mark.skipif(not os.path.exists(ONNX_PATH), reason="no golden onnx")
def test_onnx_loader_shapes():
    from humanoid_tpu.deploy.onnx_loader import load_onnx_mlp

    f = load_onnx_mlp(ONNX_PATH)
    shapes = [w.shape for w, _ in f.layers]
    assert shapes == [(705, 512), (512, 256), (256, 128), (128, 12)]
    y = f(np.zeros((2, 705), dtype=np.float32))
    assert y.shape == (2, 12) and np.isfinite(y).all()


@pytest.mark.skipif(not os.path.exists(ONNX_PATH), reason="no golden onnx")
def test_sim2sim_harness_runs():
    """The harness executes the full 1 kHz loop with the golden policy.
    (Walking quality is a training-level gate, not a harness unit test —
    the bundled checkpoint falls even in the reference's own conventions.)"""
    mujoco = pytest.importorskip("mujoco")
    from humanoid_tpu.deploy.onnx_loader import load_onnx_mlp
    from humanoid_tpu.deploy.sim2sim import Sim2simCfg, run_mujoco

    policy = load_onnx_mlp(ONNX_PATH)
    cfg = Sim2simCfg(sim_duration=1.0)
    m = run_mujoco(policy, cfg, command=(0.3, 0.0, 0.0))
    assert 0 < m["survived_s"] <= 1.0
    assert np.isfinite(m["distance_m"])


def test_sim2sim_dashboard_png(tmp_path):
    """--plot renders the 3x3 joint-tracking/velocity/contact dashboard
    from the replay (reference sim2sim.py:108-133,240-254 live plots)."""
    mujoco = pytest.importorskip("mujoco")
    pytest.importorskip("matplotlib")
    from humanoid_tpu.deploy.onnx_loader import load_onnx_mlp
    from humanoid_tpu.deploy.sim2sim import Sim2simCfg, run_mujoco

    policy = load_onnx_mlp(ONNX_PATH)
    png = str(tmp_path / "dash.png")
    m = run_mujoco(policy, Sim2simCfg(sim_duration=0.5),
                   command=(0.3, 0.0, 0.0), plot_path=png)
    assert m.get("dashboard") == png
    import os

    assert os.path.getsize(png) > 10_000


def test_sim2sim_obs_assembly_matches_env():
    """The harness's 47-dim obs layout equals the env's (the sim2sim premise:
    independently assembled obs agree, SURVEY.md §3.3)."""
    from humanoid_tpu.deploy.sim2sim import Sim2simCfg

    cfg = Sim2simCfg()
    # structural agreement: slot counts must add up exactly
    assert 5 + 3 * cfg.num_actions + 6 == cfg.num_single_obs


def test_sim2sim_obs_values_match_env():
    """VALUE-level parity: rebuilding the single obs frame from the raw
    physical state with sim2sim's conventions (scales, frames, ordering,
    phase clock) reproduces the env's own obs — catches sign/frame errors
    the structural check cannot (e.g. world- vs body-frame angular
    velocity, euler conventions)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from humanoid_tpu.config.structs import DomainRandCfg, NoiseCfg, XBotLCfg
    from humanoid_tpu.deploy.sim2sim import Sim2simCfg, _quat_to_euler
    from humanoid_tpu.env import XBotLEnv
    from humanoid_tpu.physics.spatial import quat_rotate_inverse

    cfg = XBotLCfg()
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, num_envs=1),
        noise=NoiseCfg(add_noise=False),
        domain_rand=DomainRandCfg(
            randomize_friction=False, randomize_base_mass=False,
            push_robots=False, dynamic_randomization=0.0, action_delay=False,
        ),
    )
    env = XBotLEnv(cfg)
    scfg = Sim2simCfg()
    key = jax.random.PRNGKey(0)
    state = env.initial_state(key)
    step = jax.jit(env.step)
    for i in range(7):
        key, ka, ks = jax.random.split(key, 3)
        a = 0.2 * jax.random.normal(ka, (1, 12))
        state, out = step(state, a, ks)
    K = cfg.env.num_single_obs
    env_frame = np.asarray(out.obs)[0, -K:]

    # --- sim2sim-style reassembly from the raw state -------------------
    phys = state.phys
    nj = 12
    q = np.asarray(phys.qj[0])
    dq = np.asarray(phys.u[0, 6:])
    quat = np.asarray(phys.base_quat[0])              # wxyz, ours == mujoco
    omega_body = np.asarray(
        quat_rotate_inverse(phys.base_quat[0], phys.u[0, 0:3])
    )
    eu = _quat_to_euler(quat)
    eu[eu > np.pi] -= 2 * np.pi
    cmd = np.asarray(state.commands[0, 0:3])
    phase = float(state.episode_length[0]) * env.dt / scfg.cycle_time
    obs = np.zeros(K, dtype=np.float32)
    obs[0] = np.sin(2 * np.pi * phase)
    obs[1] = np.cos(2 * np.pi * phase)
    obs[2] = cmd[0] * scfg.obs_scale_lin_vel
    obs[3] = cmd[1] * scfg.obs_scale_lin_vel
    obs[4] = cmd[2] * scfg.obs_scale_ang_vel
    obs[5 : 5 + nj] = (q - np.asarray(scfg.default_pos)) * scfg.obs_scale_dof_pos
    obs[5 + nj : 5 + 2 * nj] = dq * scfg.obs_scale_dof_vel
    obs[5 + 2 * nj : 5 + 3 * nj] = np.asarray(state.actions[0])
    obs[5 + 3 * nj : 8 + 3 * nj] = omega_body
    obs[8 + 3 * nj : 11 + 3 * nj] = eu
    obs = np.clip(obs, -scfg.clip_observations, scfg.clip_observations)
    np.testing.assert_allclose(obs, env_frame, atol=2e-5)


def test_symmetry_matrices():
    obs_p, act_p = xbot_perm_matrices()
    assert obs_p.shape == (705, 705) and act_p.shape == (12, 12)
    # involution: mirroring twice is identity
    np.testing.assert_allclose(act_p @ act_p, np.eye(12), atol=1e-6)
    np.testing.assert_allclose(obs_p @ obs_p, np.eye(705), atol=1e-6)
    # orthogonal signed permutation
    np.testing.assert_allclose(obs_p @ obs_p.T, np.eye(705), atol=1e-6)
    # mirrored action swaps legs: left roll reads -right roll
    a = np.zeros(12)
    a[6] = 1.0
    np.testing.assert_allclose((a @ act_p)[0], -1.0)


def test_quintic_gait_tool():
    c = solve_quintic_swing(T=0.32, t_apex=0.16, h_apex=0.06)
    t = np.linspace(0, 0.32, 100)
    h, v, _ = evaluate(c, t)
    assert abs(h[0]) < 1e-9
    assert abs(h.max() - 0.06) < 1e-3
    assert abs(v[np.argmax(h)]) < 0.02


def test_video_recorder(tmp_path):
    """Offscreen camera-follow mp4 capture (reference play.py:91-144)."""
    pytest.importorskip("mujoco")
    pytest.importorskip("cv2")
    try:
        from humanoid_tpu.deploy.video import VideoRecorder

        rec = VideoRecorder(str(tmp_path / "v.mp4"), fps=30, width=160,
                            height=120)
    except Exception as e:  # no EGL device in some CI sandboxes
        pytest.skip(f"offscreen GL unavailable: {e}")
    for i in range(3):
        rec.add_state(np.array([0.01 * i, 0.0, 0.95]),
                      np.array([1.0, 0.0, 0.0, 0.0]), np.zeros(12))
    path = rec.close()
    assert rec.frames == 3
    assert os.path.getsize(path) > 1000


def test_torchscript_and_onnx_export(tmp_path):
    """TorchScript pair (helpers.py:242-254 artifacts) + ONNX actor export
    agree with the jax forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humanoid_tpu.algo.networks import ActorCritic, init_params
    from humanoid_tpu.config.structs import XBotLCfg, XBotLCfgPPO
    from humanoid_tpu.deploy.export import (
        export_policy_onnx,
        export_policy_torchscript,
    )

    cfg, tcfg = XBotLCfg(), XBotLCfgPPO()
    net = ActorCritic(
        num_actions=cfg.env.num_actions,
        actor_hidden_dims=tcfg.policy.actor_hidden_dims,
        critic_hidden_dims=tcfg.policy.critic_hidden_dims,
        vel_est_hidden_dims=tcfg.policy.vel_est_hidden_dims,
    )
    params = init_params(
        jax.random.PRNGKey(0), net, cfg.env.num_observations,
        cfg.env.num_privileged_obs,
    )
    obs = np.random.RandomState(0).randn(
        3, cfg.env.num_observations
    ).astype(np.float32)
    ref_act = np.asarray(net.apply(params, jnp.asarray(obs),
                                   method="act_mean"))
    ref_vel = np.asarray(net.apply(params, jnp.asarray(obs),
                                   method="estimate_vel"))

    import torch

    paths = export_policy_torchscript(params, str(tmp_path))
    pol = torch.jit.load(paths["policy_1.pt"])
    vel = torch.jit.load(paths["base_lin_vel.pt"])
    with torch.no_grad():
        ts_act = pol(torch.from_numpy(obs)).numpy()
        ts_vel = vel(torch.from_numpy(obs)).numpy()
    assert np.allclose(ts_act, ref_act, atol=1e-5)
    assert np.allclose(ts_vel, ref_vel, atol=1e-5)

    onnx_path = export_policy_onnx(
        params, str(tmp_path / "actor.onnx"), cfg.env.num_observations
    )
    from humanoid_tpu.deploy.onnx_loader import load_onnx_mlp

    f = load_onnx_mlp(onnx_path)
    assert np.allclose(f(obs), ref_act, atol=1e-5)


def test_committed_transfer_policy_walks():
    """The committed converged policy (validation/transfer_s5/
    policy_3001.npz, the round-3 headline artifact) must keep replaying
    green on the reference MJCF: a 10 s window of the deterministic 60 s
    gate replay — upright and tracking the 0.5 m/s command."""
    import os

    from humanoid_tpu.deploy.npz_policy import NpzPolicy
    from humanoid_tpu.deploy.sim2sim import cfg_for_task, run_mujoco

    npz = os.path.join(
        os.path.dirname(__file__), "..", "validation", "transfer_s5",
        "policy_3001.npz",
    )
    cfg = cfg_for_task("humanoid_ppo_transfer", duration=10.0)
    m = run_mujoco(NpzPolicy(npz), cfg, command=(0.5, 0.0, 0.0),
                   heading_hold=True)
    assert m["survived_s"] >= 10.0 - 1e-6
    assert m["mean_speed"] >= 0.35, m
    assert m["final_base_z"] >= 0.65, m


def test_perturbed_oracle_mjcf():
    """The d11 cross-model oracle (VERDICT r3 next #5): an exported MJCF
    with perturb=0.1 must load in MuJoCo, differ from the clean export by
    a genuine ~10%-scale inertial delta, and be deterministic."""
    import mujoco
    import numpy as np

    from humanoid_tpu.assets import resolve_robot
    from humanoid_tpu.config.structs import d11_cfg
    from humanoid_tpu.physics.mjcf_export import model_to_mjcf
    from humanoid_tpu.physics.urdf import load_urdf

    cfg = d11_cfg()
    urdf_path, joint_order = resolve_robot(cfg.asset)
    m = load_urdf(
        urdf_path, joint_order=joint_order,
        foot_name=cfg.asset.foot_name, knee_name=cfg.asset.knee_name,
        terminate_on=cfg.asset.terminate_after_contacts_on,
        armature=cfg.sim.armature,
    )
    clean = model_to_mjcf(m, with_floor=True)
    pert = model_to_mjcf(m, with_floor=True, perturb=0.1)
    assert pert == model_to_mjcf(m, with_floor=True, perturb=0.1)
    assert pert != clean
    mc = mujoco.MjModel.from_xml_string(clean)
    mp = mujoco.MjModel.from_xml_string(pert)
    ratio = mp.body_mass[1:] / np.maximum(mc.body_mass[1:], 1e-9)
    # every body within +-10%, and the deltas are real (not all ~1)
    assert np.all(ratio >= 0.9 - 1e-9) and np.all(ratio <= 1.1 + 1e-9)
    assert np.abs(ratio - 1.0).max() > 0.05
    assert abs(mp.body_mass.sum() - mc.body_mass.sum()) > 0.1


def test_hfield_oracle_build():
    """terrain_oracle: the synthesized non-flat oracle loads in MuJoCo,
    its elevation matches the raster range, and the sim2sim local-ground
    lookup sees the central spawn platform (VERDICT r4 next #5)."""
    mujoco = pytest.importorskip("mujoco")
    from humanoid_tpu.deploy.sim2sim import _hfield_lookup
    from humanoid_tpu.deploy.terrain_oracle import (
        make_hfield_oracle,
        parse_oracle_spec,
    )

    assert parse_oracle_spec("stairs:0.3") == ("stairs", 0.3)
    assert parse_oracle_spec("discrete") == ("discrete", 0.4)

    p = make_hfield_oracle("stairs", 0.3, size_m=12.0)
    m = mujoco.MjModel.from_xml_path(p)
    g = _hfield_lookup(m)
    # center platform is the pyramid top: locally flat
    z0 = g(0.0, 0.0)
    assert abs(g(0.5, 0.5) - z0) < 1e-3
    # the course actually descends toward the edge
    assert z0 - g(5.5, 0.0) > 0.5
    # step height ~ 0.05 + 0.18 * d
    step = 0.05 + 0.18 * 0.3
    profile = [g(x, 0.0) for x in np.arange(0.0, 5.8, 0.05)]
    drops = np.diff(profile)
    assert abs(min(drops)) < step  # bilinear ramps, no cliffs > 1 step
