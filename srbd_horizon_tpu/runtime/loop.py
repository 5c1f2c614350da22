"""Closed-loop MPC harness — the reference's per-tick main loop
(dsrbd_example.py:82-185 / dlip_example.py:88-188, SURVEY.md §3.2) as a
single jittable function.

One tick =
  1. receding-horizon shift of teleop reference parameters
     (dsrbd_example.py:101-106)
  2. terminal-node teleop write (rdot_ref from the action schedule,
     dsrbd_example.py:109-124)
  3. WPG contact-plan advance (wpg.set, dsrbd_example.py:126-131)
  4. MS-DDP solve (dsrbd_example.py:134-136)
  5. self-simulation Euler step with u*₀ + quaternion renormalization
     (dsrbd_example.py:157-160)
  6. telemetry: SRBD Newton–Euler residual of the applied step
     (dsrbd_example.py:163-175), solve metrics

Teleop (joystick/keyboard) is replaced by a reference-velocity schedule:
arrays of per-tick (action, rdot_ref) — SURVEY.md §7.2 item 7. `run` scans
the tick over the schedule, so a whole closed-loop episode is one XLA
computation; `vmap(run)` sweeps scenario batches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.math.quat import quat_normalize
from srbd_horizon_tpu.models import srbd as srbd_model
from srbd_horizon_tpu.solvers.msddp import DDPSolution, MSDDP
from srbd_horizon_tpu.wpg import WPGState, WalkingPatternGenerator, shift_reference_params


class TickInput(NamedTuple):
    """Per-tick schedule entry (replaces joy/keyboard topics,
    dsrbd_example.py:86-99)."""

    action: jnp.ndarray      # int32: 0 stance / 1 step / 2 jump
    rdot_ref: jnp.ndarray    # (3,) terminal CoM velocity reference
    w_ref: jnp.ndarray       # (3,) terminal base angular velocity reference


class TickOutput(NamedTuple):
    """Telemetry published per tick (the reference's ROS topics, §5.5)."""

    x: jnp.ndarray            # simulated state after the tick
    u0: jnp.ndarray           # applied input
    cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    defect_norm: jnp.ndarray
    srbd_residual: jnp.ndarray  # (6,) Newton–Euler residual (/srbd_constraint)


class LoopCarry(NamedTuple):
    x: jnp.ndarray
    sol: DDPSolution
    params: Dict[str, jnp.ndarray]
    wpg_state: WPGState


@dataclasses.dataclass(frozen=True)
class MPCLoop:
    """Closed-loop MPC over one problem (LIP or SRBD)."""

    solver: MSDDP
    wpg: WalkingPatternGenerator
    # SRBD extras: None for LIP (dlip publishes placeholder forces,
    # dlip_example.py:149,158, and skips the residual check)
    srbd_constants: Optional[dict] = None
    # Time-shift the warm start each tick: roll the previous plan forward
    # one node (repeating the terminal node) before the solve, aligning
    # the initial iterate with the receding horizon the same way the
    # reference parameters are shifted (dsrbd_example.py:101-106). The
    # reference's pyddp warm-starts from the UNSHIFTED previous solution
    # (stateful solver, ddp.py:96-106) — reproduced by default; the shift
    # is a beyond-reference option (same converged solution, fewer
    # iterations to reach it at steady state).
    shift_warmstart: bool = False

    @property
    def ocp(self):
        return self.solver.ocp

    def init(self, x0, params=None) -> LoopCarry:
        return LoopCarry(
            x=x0,
            sol=self.solver.init(x0),
            params=dict(params if params is not None else self.ocp.params),
            wpg_state=self.wpg.init_state(),
        )

    def _srbd_telemetry(self, x_next, u0, sol: DDPSolution):
        """Model-fidelity signal (dsrbd_example.py:163-175): plug the
        solver's node-0 plan and the applied input back into Newton–Euler."""
        if self.srbd_constants is None:
            return jnp.zeros(6, x_next.dtype)
        c = self.srbd_constants
        nc = c["feet0"].shape[0]
        s_next = srbd_model.split_srbd_state(x_next, nc)
        i0 = srbd_model.split_srbd_input(u0, nc)
        I_world = srbd_model.world_inertia(c["inertia_scaled"], s_next["o"])
        rddot0, wdot0 = srbd_model.f_srbd(
            c["m_scaled"], I_world, i0["f"],
            sol.X[0][0:3], sol.X[0][7:7 + 3 * nc].reshape(nc, 3),
            s_next["w"],
        )
        s0 = srbd_model.split_srbd_state(sol.X[0], nc)
        return srbd_model.srbd_residual(
            c["m_scaled"], I_world, i0["f"], s0["r"], rddot0, s0["c"],
            s0["w"], wdot0,
        )

    def _pre_solve(self, params, wpg_state, inp: TickInput):
        """Per-tick parameter update: reference shift + teleop write + WPG
        advance (dsrbd_example.py:101-131)."""
        ns = self.ocp.ns
        params = shift_reference_params(
            params,
            ("rdot_ref", "w_ref", "oref", "orientation_tracking_gain"),
        )  # dsrbd_example.py:101-106
        params["rdot_ref"] = params["rdot_ref"].at[ns].set(
            inp.rdot_ref.astype(params["rdot_ref"].dtype)
        )  # dsrbd_example.py:115,122
        return self.wpg.advance(params, wpg_state, inp.action)

    def _post_solve(self, x, sol: DDPSolution, params):
        """Self-simulation + telemetry (dsrbd_example.py:157-175)."""
        ocp = self.ocp
        u0 = sol.U[0]
        x_next = ocp.step(x, u0, ocp.params_at(params, 0), ocp.dt)
        if self.srbd_constants is not None:
            # quaternion renormalization (dsrbd_example.py:160)
            x_next = x_next.at[3:7].set(quat_normalize(x_next[3:7]))
        out = TickOutput(
            x=x_next,
            u0=u0,
            cost=sol.cost,
            iterations=sol.iterations,
            converged=sol.converged,
            defect_norm=sol.defect_norm,
            srbd_residual=self._srbd_telemetry(x_next, u0, sol),
        )
        return x_next, out

    def _shift_sol(self, sol: DDPSolution) -> DDPSolution:
        """Roll the previous plan one node forward (terminal repeated) —
        the warm start then predicts the same wall-clock trajectory the
        shifted parameters describe."""
        X = jnp.roll(sol.X, -1, axis=0).at[-1].set(sol.X[-1])
        U = jnp.roll(sol.U, -1, axis=0).at[-1].set(sol.U[-1])
        return sol._replace(X=X, U=U)

    def tick(self, carry: LoopCarry, inp: TickInput) -> Tuple[LoopCarry, TickOutput]:
        params, wpg_state = self._pre_solve(carry.params, carry.wpg_state, inp)
        sol0 = self._shift_sol(carry.sol) if self.shift_warmstart else carry.sol
        sol = self.solver.solve(sol0, carry.x, params)
        x_next, out = self._post_solve(carry.x, sol, params)
        return LoopCarry(x=x_next, sol=sol, params=params, wpg_state=wpg_state), out

    def tick_batch(self, carry: LoopCarry, inp: TickInput) -> Tuple[LoopCarry, TickOutput]:
        """Batched tick over a leading scenario axis — identical semantics
        to vmap(tick) but routing the solve through the lane-major batched
        solver path (solve_batch). This is the production fleet hot path."""
        params, wpg_state = jax.vmap(self._pre_solve)(
            carry.params, carry.wpg_state, inp
        )
        sol0 = (
            jax.vmap(self._shift_sol)(carry.sol)
            if self.shift_warmstart else carry.sol
        )
        sol = self.solver.solve_batch(sol0, carry.x, params)
        x_next, out = jax.vmap(self._post_solve)(carry.x, sol, params)
        return LoopCarry(x=x_next, sol=sol, params=params, wpg_state=wpg_state), out

    def run_batch(self, carry: LoopCarry, schedule: TickInput) -> Tuple[LoopCarry, TickOutput]:
        """Scan tick_batch over a (T,)-leading schedule of batched inputs:
        a whole fleet episode as one XLA computation."""
        return jax.lax.scan(self.tick_batch, carry, schedule)

    def run(self, carry: LoopCarry, schedule: TickInput) -> Tuple[LoopCarry, TickOutput]:
        """Scan the tick over a (T,)-leading schedule: a whole closed-loop
        episode as one XLA computation."""
        return jax.lax.scan(self.tick, carry, schedule)


def standing_schedule(T: int, dtype=jnp.float32) -> TickInput:
    return TickInput(
        action=jnp.zeros(T, jnp.int32),
        rdot_ref=jnp.zeros((T, 3), dtype),
        w_ref=jnp.zeros((T, 3), dtype),
    )


def walking_schedule(T: int, vx: float = 0.3, vy: float = 0.0,
                     start: int = 10, dtype=jnp.float32) -> TickInput:
    """Stand for `start` ticks, then walk with terminal velocity (vx, vy) —
    the keyboard teleop pattern (dsrbd_example.py:109-131)."""
    t = jnp.arange(T)
    walking = t >= start
    return TickInput(
        action=jnp.where(walking, 1, 0).astype(jnp.int32),
        rdot_ref=jnp.where(
            walking[:, None],
            jnp.array([vx, vy, 0.0], dtype)[None],
            jnp.zeros(3, dtype)[None],
        ),
        w_ref=jnp.zeros((T, 3), dtype),
    )
