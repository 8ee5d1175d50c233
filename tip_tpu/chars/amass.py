"""AMASS humanoid character description — pure data.

Replaces the reference's pluggable ``amass_char_info.py`` module
(/root/reference/amass_char_info.py:28-109) with a frozen dataclass so that a
character is configuration, not code.  Joint indices follow the URDF file
order (= PyBullet link order under URDF_MAINTAIN_LINK_ORDER), root = -1.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

JOINT_NAMES: List[str] = [
    "lhip", "lknee", "lankle",
    "rhip", "rknee", "rankle",
    "lowerback", "upperback", "chest", "lowerneck", "upperneck",
    "lclavicle", "lshoulder", "lelbow", "lwrist",
    "rclavicle", "rshoulder", "relbow", "rwrist",
]

# fixed (weld) joints — the wrists carry IMUs but have no DoF
# (reference amass_char_info.py:105,109: nimble_state_map[l/rwrist] = None)
FIXED_JOINTS: Tuple[int, int] = (14, 18)


@dataclass(frozen=True)
class CharInfo:
    """Joint index tables for one character morphology."""

    joint_names: Tuple[str, ...]
    root: int = -1

    # bullet joint index -> nimble q index (root=0) (amass_char_info.py:64-84)
    nimble_map: Dict[int, int] = field(default_factory=dict)
    # bullet joint index -> nimble *state* index; fixed joints -> -1
    # (amass_char_info.py:89-109)
    nimble_state_map: Dict[int, int] = field(default_factory=dict)

    v_up: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    v_face: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))
    v_up_env: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))

    def __post_init__(self):
        pass

    @property
    def joint_idx(self) -> Dict[str, int]:
        d = {"root": self.root}
        d.update({n: i for i, n in enumerate(self.joint_names)})
        return d

    @property
    def n_joints(self) -> int:
        return len(self.joint_names)

    @property
    def non_root_active_idx(self) -> List[int]:
        """Actuated (spherical) joints, excluding root and fixed wrists.

        Mirrors SimAgent.non_root_active_idx (reference bullet_agent.py:144-157).
        """
        return [i for i in range(self.n_joints) if i not in FIXED_JOINTS]

    # ---- precomputed gather tables for pose-format conversion ----

    @property
    def bullet_from_nimble_gather(self) -> np.ndarray:
        """For each active joint (bullet order), the nimble-state aa slot.

        our_pose_2_bullet_format (reference data_utils.py:246-259) reads, per
        active bullet joint, s[6 + 3*(nimble_state_map[idx]-1) : +3].
        """
        return np.array(
            [self.nimble_state_map[i] - 1 for i in self.non_root_active_idx],
            dtype=np.int32,
        )


def _build_amass_char() -> CharInfo:
    names = JOINT_NAMES
    jid = {n: i for i, n in enumerate(names)}
    jid["root"] = -1

    nimble_map = {
        jid["root"]: 0,
        jid["lhip"]: 1, jid["lknee"]: 2, jid["lankle"]: 3,
        jid["lowerback"]: 4, jid["upperback"]: 5, jid["chest"]: 6,
        jid["lclavicle"]: 7, jid["lshoulder"]: 8, jid["lelbow"]: 9,
        jid["lwrist"]: 10,
        jid["lowerneck"]: 11, jid["upperneck"]: 12,
        jid["rclavicle"]: 13, jid["rshoulder"]: 14, jid["relbow"]: 15,
        jid["rwrist"]: 16,
        jid["rhip"]: 17, jid["rknee"]: 18, jid["rankle"]: 19,
    }
    nimble_state_map = {
        jid["root"]: 0,
        jid["lhip"]: 1, jid["lknee"]: 2, jid["lankle"]: 3,
        jid["lowerback"]: 4, jid["upperback"]: 5, jid["chest"]: 6,
        jid["lclavicle"]: 7, jid["lshoulder"]: 8, jid["lelbow"]: 9,
        jid["lowerneck"]: 10, jid["upperneck"]: 11,
        jid["rclavicle"]: 12, jid["rshoulder"]: 13, jid["relbow"]: 14,
        jid["rhip"]: 15, jid["rknee"]: 16, jid["rankle"]: 17,
        jid["lwrist"]: -1, jid["rwrist"]: -1,   # fixed, no state slot
    }

    return CharInfo(
        joint_names=tuple(names),
        nimble_map=nimble_map,
        nimble_state_map=nimble_state_map,
    )


AMASS_CHAR = _build_amass_char()

# IMU sensor placement, bullet joint indices. Order defines the 6x(9+3) feature
# layout: [root, lwrist, rwrist, lknee, rknee, upperneck]
# (reference data-gen-and-viz-bullet-new.py:157-166, knee-IMU variant).
IMU_JOINTS_KNEE = (-1,
                   AMASS_CHAR.joint_idx["lwrist"], AMASS_CHAR.joint_idx["rwrist"],
                   AMASS_CHAR.joint_idx["lknee"], AMASS_CHAR.joint_idx["rknee"],
                   AMASS_CHAR.joint_idx["upperneck"])
# ankle-IMU variant (reference data-gen-and-viz-bullet-new.py:167-174)
IMU_JOINTS_ANKLE = (-1,
                    AMASS_CHAR.joint_idx["rankle"], AMASS_CHAR.joint_idx["lankle"],
                    AMASS_CHAR.joint_idx["lwrist"], AMASS_CHAR.joint_idx["rwrist"],
                    AMASS_CHAR.joint_idx["upperneck"])

# SBP-constrained links, order defines the n_sbps*4 label layout
# (reference data-gen-and-viz-bullet-new.py:82-88).
SBP_LINKS = (AMASS_CHAR.joint_idx["lankle"], AMASS_CHAR.joint_idx["rankle"],
             AMASS_CHAR.joint_idx["lwrist"], AMASS_CHAR.joint_idx["rwrist"],
             AMASS_CHAR.root)

# IK chains: sbp name -> [parent, a, b, c] bullet links
# (reference real_time_runner.py:81-86)
IK_CHAIN_BULLET = {
    "lankle": (-1, 0, 1, 2),
    "rankle": (-1, 3, 4, 5),
    "lwrist": (11, 12, 13, 14),
    "rwrist": (15, 16, 17, 18),
}
# limb joints whose angles IK rewrites, nimble-state indices
# (reference real_time_runner.py:90-95)
IK_CHAIN_NIMBLE = {
    "lankle": (1, 2, 3),
    "rankle": (15, 16, 17),
    "lwrist": (8, 9),
    "rwrist": (13, 14),
}
