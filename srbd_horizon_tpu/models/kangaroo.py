"""Kangaroo biped model constants.

The reference derives these at startup from the Kangaroo URDF via
casadi_kin_dyn/Pinocchio at the nominal `joint_init` configuration
(reference prb.py:92-96,130-139; launch/SRBD_kangaroo_line_feet.launch:9-33):
  - total mass `m = kindyn.mass()`
  - centroidal rotational inertia `I = crba(joint_init)[3:6, 3:6]`
  - initial contact positions `fk(frame)(joint_init)` for foot_frames
    ["left_foot_upper", "left_foot_lower", "right_foot_upper",
     "right_foot_lower"] (launch:24-25), re-based so that `left_sole_link`
    is the world frame (launch:22, utilities.py:12-32)
  - CoM position `centerOfMass()(joint_init)`

The Kangaroo URDF lives in the external, unvendored `kangaroo_horizon`
package (launch:9-10), so this repo vendors a Kangaroo-like stand-in asset
(`assets/kangaroo_like.urdf`: 40 kg, light legs, line feet, CoM at 0.88 m
in the left-sole world frame) and records the constants EXTRACTED FROM IT
via `tools/urdf_constants` / `models/urdf.py` (the casadi_kin_dyn role,
prb.py:92-96,130-139). The asset is constructed to reproduce every number
that IS pinned in the reference source:
  - CoM height 0.88 m above the soles — the reference hardcodes the LIP
    pendulum height as 9.81/0.88 (prb.py:317), which equals com_z because
    the LIP and SRBD problems share the same initial state (prb.py:420-421).
  - world frame = left sole ⇒ left-foot contacts at z=0, y=0 (launch:22).
  - line feet: two contact points per foot (contact_model=2, launch:16).
tests/test_urdf.py re-runs the extraction and fails if the recorded
constants below drift from the committed asset (hand edits break CI).
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np

KANGAROO_URDF = str(
    pathlib.Path(__file__).resolve().parents[1] / "assets" / "kangaroo_like.urdf"
)
# the stand-in's nominal configuration (its joint_init, launch:27-33 role):
# 6 pitch joints (hip/knee/ankle × 2) at zero
KANGAROO_JOINT_INIT = (0.0,) * 6
KANGAROO_FOOT_FRAMES = (
    "left_foot_upper",
    "left_foot_lower",
    "right_foot_upper",
    "right_foot_lower",
)
KANGAROO_WORLD_FRAME = "left_sole_link"


@dataclasses.dataclass(frozen=True)
class RobotConstants:
    """Reduced-model constants consumed by problem builders."""

    mass: float
    inertia: np.ndarray            # (3,3) centroidal rotational inertia [kg m^2]
    com: np.ndarray                # (3,) nominal CoM in world frame [m]
    foot_positions: np.ndarray     # (nc, 3) nominal contact positions [m]
    foot_frames: tuple

    @property
    def nc(self) -> int:
        return self.foot_positions.shape[0]


def kangaroo_line_feet() -> RobotConstants:
    """nc=4 line-feet configuration (launch:16-17,24-25).

    Values recorded from `tools/urdf_constants assets/kangaroo_like.urdf
    --joints 0,0,0,0,0,0 --frames left_foot_upper,... --world-frame
    left_sole_link` (regenerated + asserted by tests/test_urdf.py —
    do not edit by hand).

    Contact ordering matches the reference's foot_frames parameter order,
    which fixes the state-variable ordering (prb.py:116,129-135):
      0: left_foot_upper   1: left_foot_lower
      2: right_foot_upper  3: right_foot_lower
    """
    half_foot = 0.08       # fore/aft half-length of the line foot [m]
    stance_width = 0.18    # lateral distance between sole centers [m]
    return RobotConstants(
        mass=40.0,
        inertia=np.diag([2.11556, 1.82968, 0.62288]),
        com=np.array([0.0, -stance_width / 2.0, 0.88]),
        foot_positions=np.array(
            [
                [half_foot, 0.0, 0.0],
                [-half_foot, 0.0, 0.0],
                [half_foot, -stance_width, 0.0],
                [-half_foot, -stance_width, 0.0],
            ]
        ),
        foot_frames=KANGAROO_FOOT_FRAMES,
    )


def kangaroo_from_urdf(urdf_path: str = KANGAROO_URDF) -> RobotConstants:
    """Extract RobotConstants live from the committed URDF asset (the
    reference's startup path: URDF → casadi_kin_dyn → constants,
    prb.py:92-96,130-139). `kangaroo_line_feet()` is the recorded
    fast-import equivalent; tests assert they agree."""
    from srbd_horizon_tpu.models.urdf import load_robot_constants

    return load_robot_constants(
        urdf_path,
        joints=list(KANGAROO_JOINT_INIT),
        foot_frames=list(KANGAROO_FOOT_FRAMES),
        world_frame=KANGAROO_WORLD_FRAME,
    )


def point_feet(number_of_legs: int = 2) -> RobotConstants:
    """contact_model=1 configuration (one contact per foot). The reference
    provisions this topology via the `contact_model` parameter
    (prb.py:39-41, isrbd_example.py:278-283)."""
    stance_width = 0.18
    feet = []
    frames = []
    for leg in range(number_of_legs):
        y = -stance_width * leg
        feet.append([0.0, y, 0.0])
        frames.append(f"sole_{leg}")
    feet_arr = np.asarray(feet, dtype=np.float64)
    return RobotConstants(
        mass=40.0,
        inertia=np.diag([2.11556, 1.82968, 0.62288]),
        com=np.array([0.0, feet_arr[:, 1].mean(), 0.88]),
        foot_positions=feet_arr,
        foot_frames=tuple(frames),
    )
