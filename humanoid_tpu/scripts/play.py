"""Policy evaluation / export (reference scripts/play.py).

Loads the latest checkpoint, rolls the deterministic policy in a small
noise/push-free env with a fixed forward command, exports the portable .npz
policy + the open-loop action dump, logs joint/velocity/contact traces, and
renders the eval dashboard PNG.

  python -m humanoid_tpu.scripts.play --task humanoid_ppo --steps 300
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="humanoid_tpu eval")
    p.add_argument("--task", default="humanoid_ppo")
    p.add_argument("--num-envs", dest="num_envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--load-run", dest="load_run", default="-1")
    p.add_argument("--checkpoint", type=int, default=-1)
    p.add_argument("--cmd", type=float, nargs=3, default=[0.5, 0.0, 0.0])
    p.add_argument("--log-root", dest="log_root")
    p.add_argument("--out-dir", dest="out_dir", default="/tmp/humanoid_play")
    p.add_argument("--video", action="store_true",
                   help="record a camera-follow mp4 of env 0 (offscreen "
                        "MuJoCo replay of the TPU-sim trajectory; reference "
                        "play.py:91-144)")
    return p.parse_args(argv)


def play(args):
    import jax
    import jax.numpy as jnp

    from ..algo.runner import OnPolicyRunner
    from ..config.structs import DomainRandCfg, EnvCfg, NoiseCfg
    from ..deploy.export import export_policy_npz
    from ..env import XBotLEnv
    from ..utils import registry
    from ..utils.checkpoint import get_load_path
    from ..utils.eval_logger import EvalLogger

    env_cfg, train_cfg = registry.get_cfgs(args.task)
    # eval overrides (play.py:50-64): few envs, plane, no noise/push/rand
    env_cfg = env_cfg.replace(
        env=dataclasses.replace(env_cfg.env, num_envs=args.num_envs),
        noise=NoiseCfg(add_noise=False),
        domain_rand=DomainRandCfg(
            randomize_friction=False, randomize_base_mass=False,
            push_robots=False, dynamic_randomization=0.0, action_delay=False,
        ),
    )
    env = XBotLEnv(env_cfg)
    runner = OnPolicyRunner(env, train_cfg)
    root = os.path.join(
        args.log_root or registry.LOG_ROOT, train_cfg.runner.experiment_name
    )
    path = get_load_path(root, args.load_run, args.checkpoint)
    print(f"loading checkpoint: {path}")
    runner.load(path)

    os.makedirs(args.out_dir, exist_ok=True)
    npz_path = export_policy_npz(
        runner.train_state.params,
        os.path.join(args.out_dir, "policy.npz"),
        meta={"iteration": runner.iteration},
    )
    print(f"exported policy: {npz_path}")
    # reference artifact parity: TorchScript pair + ONNX actor
    # (helpers.py:242-254; OnnxTest.onnx)
    try:
        from ..deploy.export import (
            export_policy_onnx,
            export_policy_torchscript,
        )

        ts = export_policy_torchscript(runner.train_state.params,
                                       args.out_dir)
        onnx_path = export_policy_onnx(
            runner.train_state.params,
            os.path.join(args.out_dir, "policy.onnx"),
            env.cfg.env.num_observations,
        )
        print(f"exported: {', '.join(ts)} + {os.path.basename(onnx_path)}")
    except Exception as e:  # torch is a deploy-only optional dependency
        print(f"torchscript/onnx export skipped: {e}")

    N = args.num_envs
    policy = runner.inference_policy()
    step = jax.jit(env.step)
    state = env.initial_state(jax.random.PRNGKey(0))
    cmd = jnp.tile(jnp.asarray(args.cmd + [0.0]), (N, 1))
    state, out = step(state, jnp.zeros((N, env.nj)), jax.random.PRNGKey(1))

    logger = EvalLogger(env.dt)
    actions_log = []
    recorder = None
    render_every = 1
    if args.video:
        from ..deploy.video import VideoRecorder

        render_every = 3  # 100 Hz control -> ~33 fps video
        recorder = VideoRecorder(
            os.path.join(args.out_dir, "play.mp4"),
            fps=1.0 / (render_every * env.dt),
        )
    joint = 2
    frames_pending = []
    states_pending = []
    for i in range(args.steps):
        state = state._replace(commands=cmd)
        action = policy(out.obs)
        if i < 100:
            actions_log.append(action[0])
        state, out = step(state, action, jax.random.PRNGKey(2 + i))
        phys = state.phys
        if recorder is not None and i % render_every == 0:
            frames_pending.append(
                (phys.base_pos[0], phys.base_quat[0], phys.qj[0])
            )
        from ..physics.spatial import quat_rotate_inverse

        v_body = quat_rotate_inverse(phys.base_quat[:1], phys.u[:1, 3:6])
        w_body = quat_rotate_inverse(phys.base_quat[:1], phys.u[:1, 0:3])
        # keep values on-device; one batched device_get at the end (a
        # per-step float() pull costs a full host round trip each)
        states_pending.append(
            jnp.concatenate([
                phys.qj[0, joint, None], action[0, joint, None] * 0.25,
                phys.u[0, 6 + joint, None], v_body[0], w_body[0, 2, None],
                cmd[0, 0:3], phys.base_pos[0, 2, None],
            ])
        )

    for row in np.asarray(jax.device_get(jnp.stack(states_pending))):
        logger.log_states(
            {
                "dof_pos": row[0],
                "dof_pos_target": row[1],
                "dof_vel": row[2],
                "base_vel_x": row[3],
                "base_vel_y": row[4],
                "base_vel_z": row[5],
                "base_vel_yaw": row[6],
                "command_x": row[7],
                "command_y": row[8],
                "command_yaw": row[9],
                "base_height": row[10],
            }
        )
    if recorder is not None:
        for bp, bq, qj in jax.device_get(frames_pending):
            recorder.add_state(np.asarray(bp), np.asarray(bq),
                               np.asarray(qj))

    np.savez(
        os.path.join(args.out_dir, "openloop_action.npz"),
        action=np.asarray(jax.device_get(jnp.stack(actions_log)))
        if actions_log else np.zeros((0, env.nj)),
    )
    if recorder is not None:
        print(f"video: {recorder.close()} ({recorder.frames} frames)")
    png = logger.plot_states(os.path.join(args.out_dir, "eval.png"))
    z = float(state.phys.base_pos[0, 2])
    print(f"rollout done: {args.steps} steps, final base z {z:.3f}, "
          f"plots: {png}, actions: openloop_action.npz")
    return {"final_z": z, "npz": npz_path}


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    play(get_args())
