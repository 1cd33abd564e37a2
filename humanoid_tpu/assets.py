"""Asset resolution.

Robot description files (URDF/MJCF/meshes) are *data*, not code; they are
loaded from the reference checkout's resources directory by default
(read-only mount, see /root/reference/resources/robots/XBot) and can be
redirected with HUMANOID_TPU_ASSETS for standalone deployments.
"""
from __future__ import annotations

import os
import re
import tempfile

ASSET_ROOT = os.environ.get(
    "HUMANOID_TPU_ASSETS", "/root/reference/resources"
)

XBOT_URDF = os.path.join(ASSET_ROOT, "robots/XBot/urdf/XBot-L.urdf")
XBOT_MJCF = os.path.join(ASSET_ROOT, "robots/XBot/mjcf/XBot-L.xml")
XBOT_MJCF_TERRAIN = os.path.join(
    ASSET_ROOT, "robots/XBot/mjcf/XBot-L-terrain.xml"
)

# Actuated dof order used everywhere (matches the reference's MuJoCo actuator
# order, /root/reference/humanoid/scripts/sim2sim.py:307-309 kps layout).
XBOT_JOINT_ORDER = (
    "left_leg_roll_joint",
    "left_leg_yaw_joint",
    "left_leg_pitch_joint",
    "left_knee_joint",
    "left_ankle_pitch_joint",
    "left_ankle_roll_joint",
    "right_leg_roll_joint",
    "right_leg_yaw_joint",
    "right_leg_pitch_joint",
    "right_knee_joint",
    "right_ankle_pitch_joint",
    "right_ankle_roll_joint",
)


def prepare_mujoco_xml(mjcf_path: str = XBOT_MJCF) -> str:
    """Return a loadable copy of the XBot MJCF.

    The shipped file uses a MuJoCo-2.x-only `sensornoise` flag and relative
    mesh paths; write a patched copy next to a mesh symlink in a temp dir."""
    src = open(mjcf_path).read()
    src = re.sub(r'sensornoise="[^"]*"', "", src)
    tmp = tempfile.mkdtemp(prefix="xbot_mjcf_")
    robot_dir = os.path.dirname(os.path.dirname(mjcf_path))
    os.makedirs(os.path.join(tmp, "mjcf"), exist_ok=True)
    for sub in ("meshes", "terrain"):
        target = os.path.join(robot_dir, sub)
        if os.path.isdir(target):
            os.symlink(target, os.path.join(tmp, sub))
    out = os.path.join(tmp, "mjcf", os.path.basename(mjcf_path))
    with open(out, "w") as f:
        f.write(src)
    return out
