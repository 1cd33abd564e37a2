"""Offscreen video recording of rollouts (reference parity: play.py's
camera-follow mp4 capture, /root/reference/humanoid/scripts/play.py:91-144).

The reference records through Isaac Gym's camera sensor + OpenCV. Here the
TPU physics has no renderer, so videos are produced by replaying generalized
coordinates (base pose + joint angles) through the XBot-L MuJoCo model with
an EGL offscreen `mujoco.Renderer` and a tracking camera, then encoding with
OpenCV — works for both TPU-sim trajectories (scripts/play.py --video) and
MuJoCo sim2sim runs (deploy/sim2sim.py --video).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _ensure_gl_backend() -> None:
    """Headless containers have no X display; default to EGL."""
    if "MUJOCO_GL" not in os.environ and not os.environ.get("DISPLAY"):
        os.environ["MUJOCO_GL"] = "egl"


class VideoRecorder:
    """Renders MuJoCo qpos frames to an mp4 with a base-tracking camera."""

    def __init__(
        self,
        out_path: str,
        fps: float = 30.0,
        width: int = 720,
        height: int = 480,
        model_path: Optional[str] = None,
        track_body: str = "base_link",
        distance: float = 3.0,
        azimuth: float = 135.0,
        elevation: float = -20.0,
    ):
        _ensure_gl_backend()
        import cv2
        import mujoco

        from ..assets import prepare_mujoco_xml

        self._mujoco = mujoco
        path = model_path or prepare_mujoco_xml()
        self.model = mujoco.MjModel.from_xml_path(path)
        self.data = mujoco.MjData(self.model)
        self.base_id = mujoco.mj_name2id(
            self.model, mujoco.mjtObj.mjOBJ_BODY, track_body
        )
        # default MJCF offscreen framebuffer is 640x480; grow it to fit
        self.model.vis.global_.offwidth = max(
            self.model.vis.global_.offwidth, width
        )
        self.model.vis.global_.offheight = max(
            self.model.vis.global_.offheight, height
        )
        self.renderer = mujoco.Renderer(self.model, height, width)
        self.camera = mujoco.MjvCamera()
        self.camera.type = mujoco.mjtCamera.mjCAMERA_TRACKING
        self.camera.trackbodyid = self.base_id
        self.camera.distance = distance
        self.camera.azimuth = azimuth
        self.camera.elevation = elevation
        self.out_path = out_path
        self._writer = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )
        self._cv2 = cv2
        self.frames = 0

    # ------------------------------------------------------------------

    def add_qpos(self, qpos: np.ndarray) -> None:
        """Render one frame from a full MuJoCo qpos vector."""
        self.data.qpos[:] = np.asarray(qpos, dtype=np.float64)
        self._mujoco.mj_forward(self.model, self.data)
        self.renderer.update_scene(self.data, camera=self.camera)
        frame = self.renderer.render()
        self._writer.write(self._cv2.cvtColor(frame, self._cv2.COLOR_RGB2BGR))
        self.frames += 1

    def add_state(
        self,
        base_pos: np.ndarray,
        base_quat_wxyz: np.ndarray,
        qj: np.ndarray,
    ) -> None:
        """Render one frame from TPU-sim state (base pose + joint angles).

        The engine's base_pos is the base_link frame origin in world; the
        MJCF freejoint carries the body at model.body_pos offset, matching
        the sim2sim init convention (deploy/sim2sim.py qpos[2] handling)."""
        nj = len(qj)
        qpos = np.zeros(self.model.nq)
        qpos[0:3] = np.asarray(base_pos) - self.model.body_pos[self.base_id]
        qpos[3:7] = np.asarray(base_quat_wxyz)
        qpos[-nj:] = np.asarray(qj)
        self.add_qpos(qpos)

    def close(self) -> str:
        self._writer.release()
        try:
            self.renderer.close()
        except Exception:
            pass
        return self.out_path
