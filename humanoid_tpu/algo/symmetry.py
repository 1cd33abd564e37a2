"""Mirror-symmetry permutation specs for the XBot-L observation/action
spaces.

The reference PPO can add a symmetry loss built from signed permutation
lists (ppo.py:92-105, mirrored = perm_matrix @ original, replicated across
the frame stack). Disabled by default for the XBot task (the reference's
XBotLCfgPPO defines no sym_loss), but the machinery is complete. We encode
entries as explicit (source_index, sign) pairs instead of the reference's
±float trick (which cannot express "-0").

XBot-L mirror (left/right swap across the x-z plane), dof order
[L_roll, L_yaw, L_pitch, L_knee, L_ankle_p, L_ankle_r, R_*]:
every joint swaps sides with a sign flip — the XBot URDF's right-leg
joint axes are the exact negation of the left's (the same convention its
mirrored joint limits and the reference's gait generator follow:
compute_ref_state drives the left leg with sin<=0 and the right with
sin>=0, humanoid_env.py:717-744 — i.e. ref_left = -ref_right).

The signs are VALIDATED against the URDF geometry, not assumed:
tests/test_symmetry.py runs FK on (q, mirror(q)) and asserts every
left/right body-pair's position and default-pose-relative orientation are
exact reflections (an exhaustive sign search over the 2^6 per-joint-type
combinations admits exactly this one solution).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

SignedPerm = Sequence[Tuple[int, float]]

# mirrored_left_dofs come from the right side, all sign-flipped (and vice
# versa) — see module docstring for the URDF-geometry validation
ACT_PERMUTATION: SignedPerm = (
    (6, -1), (7, -1), (8, -1), (9, -1), (10, -1), (11, -1),
    (0, -1), (1, -1), (2, -1), (3, -1), (4, -1), (5, -1),
)

# 18-dof layout (assets.XBOT18_JOINT_ORDER): 6 arm dofs then the 12 legs.
# All three arm joints mirror with a sign flip — the XBot URDF's right-arm
# limits are the exact negation of the left's (shoulder_pitch [-3.14,1.4]
# vs [-1.4,3.14] etc.), so q_mirror = -q_other_side.
ACT_PERMUTATION_18: SignedPerm = tuple(
    [(3, -1), (4, -1), (5, -1), (0, -1), (1, -1), (2, -1)]
    + [(src + 6, s) for src, s in ACT_PERMUTATION]
)


def act_permutation(nj: int) -> SignedPerm:
    if nj == 12:
        return ACT_PERMUTATION
    if nj == 18:
        return ACT_PERMUTATION_18
    raise ValueError(f"no mirror spec for nj={nj}")


def single_obs_permutation(nj: int = 12) -> SignedPerm:
    """47-dim single-frame obs mirror:
    [sin, cos, vx, vy, wyaw | q | dq | actions | omega_xyz | euler_rpy]."""
    perm: List[Tuple[int, float]] = []
    # phase: left/right mirror = half-cycle shift: sin -> -sin, cos -> cos
    perm += [(0, -1.0), (1, 1.0)]
    # commands: vx keeps, vy and wyaw flip
    perm += [(2, 1.0), (3, -1.0), (4, -1.0)]
    base = 5
    dof_perm = act_permutation(nj)
    for block in range(3):           # q, dq, actions share the dof mirror
        off = base + block * nj
        perm += [(off + i, s) for i, s in dof_perm]
    off = base + 3 * nj
    # angular velocity (wx, wy, wz): roll and yaw rates flip, pitch keeps
    perm += [(off + 0, -1.0), (off + 1, 1.0), (off + 2, -1.0)]
    # euler (roll, pitch, yaw): roll and yaw flip, pitch keeps
    perm += [(off + 3, -1.0), (off + 4, 1.0), (off + 5, -1.0)]
    return tuple(perm)


def build_perm_matrix(spec: SignedPerm, frame_stack: int = 1) -> np.ndarray:
    """(index, sign) spec -> dense matrix with mirrored = x @ mat
    (matching the reference's torch.matmul(obs, perm_mat), ppo.py:198)."""
    width = len(spec)
    n = width * frame_stack
    mat = np.zeros((n, n), dtype=np.float32)
    for f in range(frame_stack):
        for i, (src, sign) in enumerate(spec):
            # column i of the output reads source row src (per frame)
            mat[f * width + src, f * width + i] = sign
    return mat


def xbot_perm_matrices(frame_stack: int = 15, nj: int = 12):
    """(obs_perm (15K,15K), act_perm (nj,nj)) for the XBot-L/D11 tasks."""
    obs = build_perm_matrix(single_obs_permutation(nj), frame_stack)
    act = build_perm_matrix(act_permutation(nj))
    return obs, act
