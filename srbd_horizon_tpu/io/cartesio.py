"""Whole-body IK reference formatting — the CartesI/O bridge replacement
(reference cartesio.py:4-79).

The reference publishes the plan's node-1 CoM / base-orientation / per-foot
references to an external CartesI/O IK controller over
`/cartesian/<link>/reference` topics (cartesio.py:6-7, dsrbd_example.py:
177-183), averaging the two line-feet contact points per foot
(cartesio.py:66-72). Here the same references are produced as a plain dict
(consumable by any downstream IK/transport — see runtime/bridge.py for the
native UDP publisher)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class CartesianReferenceFormatter:
    """frames: ordered foot frame names, e.g. ["left_sole_link",
    "right_sole_link"]; each foot owns `contact_model` consecutive contact
    indices (the reference hardwires pairs, dsrbd_example.py:179-182)."""

    def __init__(self, frames: Sequence[str], contact_model: int = 2):
        self.frames = list(frames)
        self.contact_model = contact_model

    def make_references(self, solution: Dict[str, np.ndarray],
                        node: int = 1) -> Dict:
        """Extract node-`node` references (the reference publishes node 1 —
        the first future state, dsrbd_example.py:177). Velocity channels
        mirror the reference's provisioned `/velocity_reference` surface
        (cartesio.py:7,29-37): CoM linear velocity = rdot, base angular
        velocity = w, foot linear velocity = cdot of the pair's FIRST
        contact (cartesio.py:74 forwards `cdot[frame][0]`, not the
        midpoint average — the pair is rigid so both match anyway).
        Missing channels (LIP has no w) default to zero, matching the
        reference's zero-initialized TwistStamped (cartesio.py:16)."""
        cm = self.contact_model
        zeros = np.zeros((node + 1, 3))
        refs: Dict = {
            "com": {
                "position": np.asarray(solution["r"][node]).tolist(),
                "linear_velocity": np.asarray(
                    solution.get("rdot", zeros)[node]
                ).tolist(),
            },
            "base_link": {
                "orientation": np.asarray(
                    solution.get("o", np.array([[0, 0, 0, 1.0]] * (node + 1)))[node]
                ).tolist(),
                "angular_velocity": np.asarray(
                    solution.get("w", zeros)[node]
                ).tolist(),
            },
        }
        for leg, frame in enumerate(self.frames):
            pts: List[np.ndarray] = [
                np.asarray(solution[f"c{leg * cm + k}"][node])
                for k in range(cm)
            ]
            # line feet: midpoint of the contact pair (cartesio.py:66-72)
            refs[frame] = {
                "position": (sum(pts) / len(pts)).tolist(),
                "linear_velocity": np.asarray(
                    solution.get(f"cdot{leg * cm}", zeros)[node]
                ).tolist(),
            }
        return refs
