"""Runtime health monitoring and recovery — a capability the reference
lacks entirely (SURVEY.md §5.3: failure handling is `exit()` on missing
params; nobody checks `is_converged`, ddp.py:106 vs dsrbd_example.py:135).

For a production MPC fleet the failure modes are: non-finite states
(solver divergence), defect blow-up (infeasible warm start after a large
disturbance), and persistent non-convergence. `check` classifies a tick's
telemetry; `reset_carry` rebuilds a clean solver state in place for the
affected scenarios only (batched, on device)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.runtime.loop import LoopCarry, TickOutput


class HealthReport(NamedTuple):
    healthy: jnp.ndarray        # bool (batched): tick usable
    finite: jnp.ndarray         # states/inputs finite
    defect_ok: jnp.ndarray      # shooting gaps under threshold
    residual_ok: jnp.ndarray    # physics residual under threshold
    cost_ok: jnp.ndarray        # solve cost under the explosion threshold


@dataclasses.dataclass(frozen=True)
class HealthMonitor:
    max_defect: float = 1e-2
    max_srbd_residual: float = 50.0   # N / N·m, scaled units
    # cost-explosion threshold: a large disturbance (e.g. a 10 m/s shove)
    # stays finite and defect-free under MS-DDP's exact defect contraction,
    # but the tracking cost jumps ~1000× above the walking steady state
    # (~1e4) — the production signal that a member needs a reset
    max_cost: float = 1e6
    # constrained-path explosion threshold, SCALED violation units
    # (OCP.eq_scale): the walking transient plateaus ~5e-2
    max_constraint_viol: float = 0.5
    # Constrained-path cost threshold — SEPARATE from max_cost: the
    # inner AL objective includes the λ/√(ρw) centering terms, which at
    # CONVERGED multipliers legitimately contribute λ²/(ρw) ≈ 3e6 on
    # the walking fleet (λ saturates ~2.4e6 by ~120 ticks; measured
    # flat thereafter — no drift). Gating it at max_cost=1e6 made the
    # serving daemon slowly reset-cycle perfectly healthy members once
    # their multipliers converged (round-4 TPU daemon finding).
    max_constrained_cost: float = 1e9

    def check(self, out: TickOutput) -> HealthReport:
        finite = jnp.all(jnp.isfinite(out.x), axis=-1) & jnp.all(
            jnp.isfinite(out.u0), axis=-1
        )
        defect_ok = out.defect_norm < self.max_defect
        residual_ok = (
            jnp.max(jnp.abs(out.srbd_residual), axis=-1)
            < self.max_srbd_residual
        )
        cost_ok = out.cost < self.max_cost
        return HealthReport(
            healthy=finite & defect_ok & cost_ok,
            finite=finite,
            defect_ok=defect_ok,
            residual_ok=residual_ok,
            cost_ok=cost_ok,
        )

    def monitored_tick_batch(self, loop, carry: LoopCarry, inp,
                             x_safe: jnp.ndarray):
        """One batched MPC tick with failure detection and in-place
        recovery: tick → classify → rebuild unhealthy members from
        `x_safe`. The production fleet hot path (the reference never
        checks `is_converged`, ddp.py:106 — this closes that gap).
        Healthy members' carries are bit-identical to a plain
        `loop.tick_batch` (masked elementwise selects only)."""
        carry, out = loop.tick_batch(carry, inp)
        report = self.check(out)
        carry = self.reset_where_unhealthy(carry, report, x_safe)
        return carry, out, report

    # ---------- constrained (AL / full-NLP) fleet ----------

    def check_constrained(self, st) -> HealthReport:
        """Classify a constrained fleet tick (ALState, batched): finite
        plan, bounded SCALED constraint violation (OCP.eq_scale units —
        the walking transient plateaus ~5e-2; an order above that is a
        diverged member), bounded cost."""
        finite = jnp.all(jnp.isfinite(st.sol.X), axis=(-2, -1)) & jnp.all(
            jnp.isfinite(st.sol.U), axis=(-2, -1)
        )
        viol_ok = st.viol < self.max_constraint_viol
        cost_ok = st.sol.cost < self.max_constrained_cost
        ok = finite & viol_ok & cost_ok
        return HealthReport(
            healthy=ok, finite=finite, defect_ok=viol_ok,
            residual_ok=viol_ok, cost_ok=cost_ok,
        )

    def monitored_constrained_tick(self, alddp, st, x0, params,
                                   x_safe: jnp.ndarray,
                                   u_safe: jnp.ndarray):
        """One batched frozen-penalty AL tick (ALDDP.solve_online_batch)
        with failure detection and in-place recovery: unhealthy members
        get their plan rebuilt from (x_safe, u_safe) and their AL
        multipliers zeroed (a diverged member's multipliers encode the
        divergence — they must not survive the reset). Healthy members
        bit-identical to a plain tick (masked selects only)."""
        st = alddp.solve_online_batch(st, x0, params)
        report = self.check_constrained(st)
        st = self.reset_constrained_where_unhealthy(
            st, report, x_safe, u_safe
        )
        return st, report

    def reset_constrained_where_unhealthy(
        self, st, report: HealthReport, x_safe: jnp.ndarray,
        u_safe: jnp.ndarray,
    ):
        ok = report.healthy

        def pick(healthy_leaf, reset_leaf):
            mask = ok.reshape(ok.shape + (1,) * (healthy_leaf.ndim - ok.ndim))
            return jnp.where(mask, healthy_leaf, reset_leaf)

        def zero_unless_ok(leaf):
            return pick(leaf, jnp.zeros_like(leaf))

        # x_safe (nx,) / u_safe (nu,) broadcast over batch and nodes
        X_reset = jnp.broadcast_to(x_safe, st.sol.X.shape)
        U_reset = jnp.broadcast_to(u_safe, st.sol.U.shape)
        sol = st.sol._replace(
            X=pick(st.sol.X, X_reset),
            U=pick(st.sol.U, U_reset),
        )
        return st._replace(
            sol=sol,
            lam_eq=zero_unless_ok(st.lam_eq),
            lam_eq_T=zero_unless_ok(st.lam_eq_T),
            mu_ub=zero_unless_ok(st.mu_ub),
            mu_lb=zero_unless_ok(st.mu_lb),
            mu_x_ub=zero_unless_ok(st.mu_x_ub),
            mu_x_lb=zero_unless_ok(st.mu_x_lb),
            mu_u_ub=zero_unless_ok(st.mu_u_ub),
            mu_u_lb=zero_unless_ok(st.mu_u_lb),
            viol=jnp.where(ok, st.viol, jnp.inf),
        )

    def reset_where_unhealthy(
        self, carry: LoopCarry, report: HealthReport, x_safe: jnp.ndarray
    ) -> LoopCarry:
        """Rebuild the solver state from a safe reference state for the
        unhealthy batch members; healthy members untouched. Batched and
        jittable (elementwise select on the carry pytree)."""
        ok = report.healthy

        def pick(healthy_leaf, reset_leaf):
            mask = ok.reshape(ok.shape + (1,) * (healthy_leaf.ndim - ok.ndim))
            return jnp.where(mask, healthy_leaf, reset_leaf)

        ns = carry.sol.U.shape[-2]
        x_reset = jnp.where(ok[..., None], carry.x, x_safe)
        X_reset = jnp.repeat(x_reset[..., None, :], ns + 1, axis=-2)
        U_reset = jnp.zeros_like(carry.sol.U)
        sol = carry.sol._replace(
            X=pick(carry.sol.X, X_reset),
            U=pick(carry.sol.U, U_reset),
        )
        return carry._replace(x=x_reset, sol=sol)
