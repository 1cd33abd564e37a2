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


# ---------------------------------------------------------------------------
# XBot-L 18-dof variant ("D11-style"): the reference fork's config targets an
# 18-dof robot (num_actions=18 / num_single_obs=65, humanoid_config.py:47-55)
# whose D11_X assets it never ships (SURVEY.md §0.1-0.2). The XBot-L URDF
# already carries complete revolute definitions (axis/limit/effort) for the
# arm joints — they are merely typed "fixed" — so the faithful 18-dof
# workload is XBot-L with {shoulder_pitch, shoulder_roll, elbow_pitch}
# re-enabled per arm, in the fork's dof order: 6 arm dofs first, then the 12
# leg dofs (compute_ref_state indexes legs at +6, humanoid_env.py:731-739).
# ---------------------------------------------------------------------------

XBOT18_ARM_JOINTS = (
    "left_shoulder_pitch_joint",
    "left_shoulder_roll_joint",
    "left_elbow_pitch_joint",
    "right_shoulder_pitch_joint",
    "right_shoulder_roll_joint",
    "right_elbow_pitch_joint",
)

XBOT18_JOINT_ORDER = XBOT18_ARM_JOINTS + XBOT_JOINT_ORDER


def make_xbot18_urdf(base_urdf: str = XBOT_URDF) -> str:
    """Write (once) and return the 18-dof URDF variant: the six arm joints
    above flipped from `fixed` to `revolute` (their axis/limit blocks are
    already present in the source file)."""
    root = os.path.join(tempfile.gettempdir(), "xbot18_urdf")
    out = os.path.join(root, "urdf", "XBot-L-18dof.urdf")
    if os.path.exists(out):
        return out
    src = open(base_urdf).read()
    for name in XBOT18_ARM_JOINTS:
        pat = r'(<joint[^>]*?name="%s"[^>]*?type=")fixed(")' % re.escape(name)
        src, n = re.subn(pat, r"\1revolute\2", src, flags=re.S)
        if n != 1:
            raise ValueError(f"joint {name} not found/unique in {base_urdf}")
    # mesh references are ../meshes/*.STL relative to the urdf/ dir
    os.makedirs(os.path.dirname(out), exist_ok=True)
    meshes = os.path.join(root, "meshes")
    if not os.path.exists(meshes):
        os.symlink(
            os.path.join(os.path.dirname(os.path.dirname(base_urdf)),
                         "meshes"),
            meshes,
        )
    with open(out + ".tmp", "w") as f:
        f.write(src)
    os.replace(out + ".tmp", out)
    return out


def resolve_robot(asset_cfg):
    """AssetCfg -> (urdf_path, joint_order). An explicit asset_cfg.urdf path
    wins (document dof order); otherwise the named robot variant."""
    if asset_cfg.urdf:
        return asset_cfg.urdf, None
    robot = getattr(asset_cfg, "robot", "xbot12")
    if robot == "xbot18":
        return make_xbot18_urdf(), XBOT18_JOINT_ORDER
    return XBOT_URDF, XBOT_JOINT_ORDER


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
