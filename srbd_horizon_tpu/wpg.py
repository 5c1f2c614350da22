"""Walking pattern generator + receding-horizon contact-plan scheduler —
device-side rebuild of `steps_phase` (reference wpg.py:3-101).

The reference mutates Horizon `Parameter` objects node-by-node in Python
loops every tick (wpg.py:74-77 shift; wpg.py:80-98 terminal write;
dsrbd_example.py:101-106 reference shift) — a known inefficiency
(SURVEY.md §3.2). Here the whole contact plan lives in the OCP parameter
pytree as (ns+1, ·) arrays and one tick is a single jittable
`advance(params, wpg_state, action)` that:
  1. shifts every scheduled parameter back one node (a roll, on device),
  2. writes the terminal node from precomputed gait cycle tables.

Cycle-table semantics reproduced exactly (wpg.py:19-64):
  - step_duration 0.5 s, dt 0.05 ⇒ step_nodes = 10
  - single-support share 0.8 (8 nodes), double-support 0.2 (2 nodes)
  - swing apex 0.1·sin over a 50-sample table — the reference's
    `np.linspace(0, np.pi, )` relies on numpy's default count=50
    (wpg.py:28), indexed at k+1 for k in 0..ss_duration-1
  - left cycle: [ds, swing(ss), ds, stance(ss), pad] ; right cycle is the
    mirror (swing in the second half); both length 2·step_nodes+1 = 21
  - `step_counter` advances once per `set` call REGARDLESS of action
    (wpg.py:101), so the gait phase keeps advancing through mode changes;
    cycle index = step_counter % (2·step_nodes) (wpg.py:71)

Actions (wpg.py:80-98), encoded as ints for lax.switch:
  STANCE(0): all cdot_switch←1, c_ref←0, w_ref←0, otg←1e2
  STEP(1):   left contacts ← l_cycle[ref_id], right ← r_cycle[ref_id]
  JUMP(2):   all cdot_switch←0, otg←0, w_ref←0
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STANCE, STEP, JUMP = 0, 1, 2
ACTION_CODES = {"standing": STANCE, "step": STEP, "jump": JUMP}


class WPGState(NamedTuple):
    """Device-side scheduler state (reference: steps_phase.step_counter)."""

    step_counter: jnp.ndarray  # int32


def _build_cycles(c_init_z: float, step_nodes: int, ss_share: float,
                  ds_share: float,
                  swing_profile: str = "reference") -> Tuple[np.ndarray, ...]:
    """Precompute the left/right step cycles (wpg.py:26-64).

    swing_profile:
      "reference" — the reference's table: 0.1·sin over a 50-sample
        linspace indexed at k+1 for k < ss (wpg.py:28 relies on numpy's
        default count=50). Because only the first ss≈8 of 50 samples
        are used, the swing ends at 0.1·sin(8π/49) ≈ 4.9 cm and the
        touchdown commands a 5 cm drop in ONE node — dynamically costly
        to track (BENCH_NOTES round 5: it sets the 1.3e-3 closed-loop
        serving floor at the x0 pin).
      "smooth" — beyond-reference opt-in: the same 0.1·sin apex spread
        over the ACTUAL ss nodes (sin(π·(k+1)/(ss+1))), so lift-off and
        touchdown are symmetric ~4 cm/node ramps with no terminal
        cliff. Same contact timing, same switch tables; only the swing
        z-trajectory changes.
    """
    ss = int(ss_share * step_nodes)
    ds = int(ds_share * step_nodes)
    if swing_profile == "smooth":
        sin = 0.1 * np.sin(np.pi * np.arange(50) / (ss + 1))
    elif swing_profile == "reference":
        # numpy default linspace count = 50 (wpg.py:28)
        sin = 0.1 * np.sin(np.linspace(0, np.pi, 50))
    else:
        raise ValueError(f"unknown swing_profile {swing_profile!r}")

    def cycle(swing_first: bool):
        z, sw = [], []
        for phase in range(2):  # two half-cycles
            swinging = swing_first if phase == 0 else not swing_first
            z += [c_init_z] * ds
            sw += [1.0] * ds
            if swinging:
                z += [c_init_z + sin[k + 1] for k in range(ss)]
                sw += [0.0] * ss
            else:
                z += [c_init_z] * ss
                sw += [1.0] * ss
        z.append(c_init_z)
        sw.append(1.0)
        return np.array(z), np.array(sw)

    l_cycle, l_switch = cycle(swing_first=True)
    r_cycle, r_switch = cycle(swing_first=False)
    return l_cycle, l_switch, r_cycle, r_switch


@dataclasses.dataclass(frozen=True)
class WalkingPatternGenerator:
    """Compile-time gait tables + the per-tick advance function."""

    nodes: int
    contact_model: int
    number_of_legs: int
    l_cycle: jnp.ndarray      # (2*step_nodes+1,)
    l_switch: jnp.ndarray
    r_cycle: jnp.ndarray
    r_switch: jnp.ndarray
    step_nodes: int
    stance_otg: float = 1e2   # orientation gain in stance/step (wpg.py:82,96)
    # Which contacts swing with the A-cycle (l_cycle, swings first); the
    # rest follow the B-cycle (r_cycle). None → the reference's biped
    # split (the first `contact_model` contacts are the left foot,
    # wpg.py:80-88). A (nc,) bool tuple generalizes the same two-phase
    # alternation to other morphologies — e.g. a quadruped trot with
    # diagonal pairs (models/quadruped.py::trot_group_mask). Beyond the
    # reference (biped-only); the cycle tables/timing are unchanged.
    group_mask: tuple = None

    @staticmethod
    def build(
        c_init_z: float,
        nodes: int,
        contact_model: int = 2,
        number_of_legs: int = 2,
        step_duration: float = 0.5,
        dt: float = 0.05,
        ss_share: float = 0.8,
        ds_share: float = 0.2,
        dtype=jnp.float32,
        group_mask=None,
        swing_profile: str = "reference",
    ) -> "WalkingPatternGenerator":
        step_nodes = int(step_duration / dt)
        l_c, l_s, r_c, r_s = _build_cycles(
            c_init_z, step_nodes, ss_share, ds_share,
            swing_profile=swing_profile,
        )
        return WalkingPatternGenerator(
            nodes=nodes,
            contact_model=contact_model,
            number_of_legs=number_of_legs,
            l_cycle=jnp.asarray(l_c, dtype),
            l_switch=jnp.asarray(l_s, dtype),
            r_cycle=jnp.asarray(r_c, dtype),
            r_switch=jnp.asarray(r_s, dtype),
            step_nodes=step_nodes,
            group_mask=(
                tuple(bool(g) for g in group_mask)
                if group_mask is not None else None
            ),
        )

    def init_state(self) -> WPGState:
        return WPGState(step_counter=jnp.asarray(0, jnp.int32))

    def advance(
        self,
        params: Dict[str, jnp.ndarray],
        state: WPGState,
        action,
        terrain_z=0.0,
    ) -> Tuple[Dict[str, jnp.ndarray], WPGState]:
        """One `steps_phase.set(action)` tick (wpg.py:68-101), fully on
        device. `action` is an int (ACTION_CODES) and may be traced.

        Shifts c_ref/cdot_switch (and w_ref/orientation_tracking_gain if
        present) back one node, then writes the terminal node.

        `terrain_z` (scalar, may be traced/batched) offsets the written
        contact-height references — per-scenario terrain variation for
        batched sweeps (a capability beyond the reference, whose c_init_z
        is baked into the tables at construction, wpg.py:34-63)."""
        nc = self.contact_model * self.number_of_legs
        ns = self.nodes
        ref_id = state.step_counter % (2 * self.step_nodes)

        def shift(a):
            # node j value moves to j-1 for j=1..ns; the terminal row keeps
            # its value (wpg.py:74-77) — overwritten below for stance/step,
            # preserved for jump (wpg.py:89-93 writes only cdot_switch).
            return jnp.roll(a, -1, axis=0).at[ns].set(a[ns])

        p = dict(params)
        p["c_ref"] = shift(p["c_ref"])
        p["cdot_switch"] = shift(p["cdot_switch"])

        cm = self.contact_model
        dtype = p["c_ref"].dtype
        if self.group_mask is not None:
            is_left = jnp.asarray(self.group_mask, bool)
        else:
            is_left = (jnp.arange(nc) < cm)

        tz = jnp.asarray(terrain_z, dtype)

        def terminal_step():
            c_ref_T = jnp.where(
                is_left, self.l_cycle[ref_id], self.r_cycle[ref_id]
            ).astype(dtype) + tz
            switch_T = jnp.where(
                is_left, self.l_switch[ref_id], self.r_switch[ref_id]
            ).astype(dtype)
            return c_ref_T, switch_T, jnp.asarray(self.stance_otg, dtype)

        def terminal_jump():
            # keep c_ref as shifted (reference leaves it untouched, wpg.py:89-93)
            return (
                p["c_ref"][ns],
                jnp.zeros(nc, dtype),
                jnp.asarray(0.0, dtype),
            )

        def terminal_stance():
            # reference writes c_ref←0 in stance (wpg.py:98); terrain shift
            # generalizes that to the local ground height (0 by default)
            return (
                jnp.full((nc,), tz, dtype),
                jnp.ones(nc, dtype),
                jnp.asarray(self.stance_otg, dtype),
            )

        c_ref_T, switch_T, otg_T = jax.lax.switch(
            jnp.asarray(action, jnp.int32),
            [terminal_stance, terminal_step, terminal_jump],
        )
        p["c_ref"] = p["c_ref"].at[ns].set(c_ref_T)
        p["cdot_switch"] = p["cdot_switch"].at[ns].set(switch_T)
        if "w_ref" in p:  # wpg.py:81,90,95
            p["w_ref"] = p["w_ref"].at[ns].set(jnp.zeros(3, dtype))
        if "orientation_tracking_gain" in p:  # wpg.py:82,91,96
            p["orientation_tracking_gain"] = (
                p["orientation_tracking_gain"].at[ns, 0].set(otg_T)
            )

        return p, WPGState(step_counter=state.step_counter + 1)


def shift_reference_params(params: Dict[str, jnp.ndarray], names) -> Dict[str, jnp.ndarray]:
    """The example-loop receding-horizon shift for teleop reference params
    (dsrbd_example.py:101-106: rdot_ref, w_ref, oref,
    orientation_tracking_gain move j → j-1; terminal row keeps its value —
    reproduced by jnp.roll + rewriting the terminal row with its pre-shift
    value, which the caller then overwrites from teleop)."""
    out = dict(params)
    for name in names:
        if name in out:
            a = out[name]
            out[name] = jnp.roll(a, -1, axis=0).at[-1].set(a[-1])
    return out
