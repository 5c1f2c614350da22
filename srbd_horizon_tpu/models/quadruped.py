"""Quadruped model constants — a second robot morphology on the same
reduced-model stack.

The reference framework is biped-only: its contact topology comes from
`contact_model` × `number_of_legs` (launch/SRBD_kangaroo_line_feet
.launch:16-17) but every gait/config it ships is the Kangaroo biped. This
module exercises the other provisioned corner — `contact_model=1,
number_of_legs=4` (point feet, reference prb.py:39-41) — with a
diagonal-pair trot gait via `WalkingPatternGenerator.group_mask`
(wpg.py), driven through the SAME problem builder, solver, and MPC loop
as the biped (problems/srbd.py, examples/quadruped_example.py).

Constants follow the same provenance discipline as models/kangaroo.py:
they are EXTRACTED from the committed `assets/quadruped_like.urdf`
through the URDF pipeline (tools/urdf_constants C++ / models/urdf.py —
the casadi_kin_dyn role, reference prb.py:92-96,130-139) and recorded
here; tests/test_quadruped.py regenerates them and fails on hand edits.
"""

from __future__ import annotations

import pathlib

import numpy as np

from srbd_horizon_tpu.models.kangaroo import RobotConstants

QUADRUPED_URDF = str(
    pathlib.Path(__file__).resolve().parents[1]
    / "assets" / "quadruped_like.urdf"
)
# nominal configuration: 8 pitch joints (hip/knee × 4 legs) at zero
QUADRUPED_JOINT_INIT = (0.0,) * 8
# ordering fixes the state-variable ordering (prb.py:116,129-135 role)
QUADRUPED_FOOT_FRAMES = ("lf_foot", "rf_foot", "lh_foot", "rh_foot")
QUADRUPED_WORLD_FRAME = "lf_foot"


def quadruped_point_feet() -> RobotConstants:
    """nc=4 point-feet quadruped (contact_model=1, number_of_legs=4).

    Values recorded from `tools/urdf_constants assets/quadruped_like.urdf
    --joints 0,...,0 --frames lf_foot,rf_foot,lh_foot,rh_foot
    --world-frame lf_foot` (regenerated + asserted by
    tests/test_quadruped.py — do not edit by hand)."""
    return RobotConstants(
        mass=32.0,
        inertia=np.diag([1.192933875, 2.431733875, 2.2092]),
        com=np.array([-0.30, -0.17, 0.4010625]),
        foot_positions=np.array(
            [
                [0.0, 0.0, 0.0],
                [0.0, -0.34, 0.0],
                [-0.60, 0.0, 0.0],
                [-0.60, -0.34, 0.0],
            ]
        ),
        foot_frames=QUADRUPED_FOOT_FRAMES,
    )


def quadruped_from_urdf(urdf_path: str = QUADRUPED_URDF) -> RobotConstants:
    """Extract RobotConstants live from the committed URDF asset (the
    reference's startup path, prb.py:92-96,130-139).
    `quadruped_point_feet()` is the recorded fast-import equivalent;
    tests assert they agree."""
    from srbd_horizon_tpu.models.urdf import load_robot_constants

    return load_robot_constants(
        urdf_path,
        joints=list(QUADRUPED_JOINT_INIT),
        foot_frames=list(QUADRUPED_FOOT_FRAMES),
        world_frame=QUADRUPED_WORLD_FRAME,
    )


def trot_group_mask() -> tuple:
    """Diagonal-pair trot grouping over (lf, rf, lh, rh): the A-group
    (lf + rh) swings with the first half-cycle, the B-group (rf + lh)
    with the second — pass as `WalkingPatternGenerator.build(...,
    group_mask=trot_group_mask())`."""
    return (True, False, False, True)
