"""Fleet fault injection + recovery — the HealthMonitor wired into the
batched MPC hot path (runtime/health.py). The reference has no failure
handling at all (SURVEY.md §5.3: `is_converged` returned but never
checked, ddp.py:106); here a NaN-corrupted member and a 10 m/s shoved
member must be detected and rebuilt in place while every untouched fleet
member's trajectory stays BIT-IDENTICAL to a fault-free run."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.health import HealthMonitor
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


B = 8
NAN_MEMBER, PUSH_MEMBER = 2, 5
FAULT_TICK = 6
T_TOTAL = 14


def _setup():
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
    key = jax.random.key(7)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float64)
    return cfg, prob, loop, x0


def _tick_input(t):
    return TickInput(
        action=jnp.full((B,), 1 if t >= 3 else 0, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0])[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), jnp.float64),
    )


def _run(loop, x0, inject, x_safe):
    monitor = HealthMonitor()
    tick = jax.jit(
        lambda c, i: monitor.monitored_tick_batch(loop, c, i, x_safe)
    )
    carry = jax.vmap(loop.init)(x0)
    xs, reports = [], []
    for t in range(T_TOTAL):
        if inject and t == FAULT_TICK:
            x = carry.x
            x = x.at[NAN_MEMBER].set(jnp.nan)
            sl = loop.ocp.state_layout.slices["rdot"]
            x = x.at[PUSH_MEMBER, sl].add(jnp.array([10.0, 0.0, 0.0]))
            carry = carry._replace(x=x)
        carry, out, rep = tick(carry, _tick_input(t))
        xs.append(np.asarray(carry.x))
        reports.append(jax.tree.map(np.asarray, rep))
    return np.stack(xs), reports, carry


class TestFleetChaosRecovery:
    def setup_method(self):
        cfg, prob, loop, x0 = _setup()
        self.x_safe = prob.initial_state
        self.clean_xs, self.clean_reports, _ = _run(
            loop, x0, inject=False, x_safe=self.x_safe
        )
        self.fault_xs, self.fault_reports, self.fault_carry = _run(
            loop, x0, inject=True, x_safe=self.x_safe
        )

    def test_clean_run_all_healthy(self):
        assert all(r.healthy.all() for r in self.clean_reports)

    def test_faults_detected(self):
        """The NaN member must be flagged at the fault tick; the shoved
        member must be flagged within a couple of ticks (its defect/
        residual blow up once the solver digests the 10 m/s jump)."""
        rep = self.fault_reports[FAULT_TICK]
        assert not rep.healthy[NAN_MEMBER]
        flagged_push = any(
            not self.fault_reports[t].healthy[PUSH_MEMBER]
            for t in range(FAULT_TICK, FAULT_TICK + 3)
        )
        assert flagged_push

    def test_fleet_survives_finite(self):
        """After recovery every member is finite to the end — the NaN
        does not propagate and the reset members keep running."""
        assert np.all(np.isfinite(self.fault_xs[FAULT_TICK:].reshape(
            T_TOTAL - FAULT_TICK, B, -1)[:, :, :]))
        assert np.all(np.isfinite(np.asarray(self.fault_carry.x)))

    def test_reset_members_rebuilt_from_safe_state(self):
        """At the fault tick the NaN member's carry equals the safe stance
        state (reset_where_unhealthy semantics)."""
        np.testing.assert_array_equal(
            self.fault_xs[FAULT_TICK, NAN_MEMBER], np.asarray(self.x_safe)
        )

    def test_untouched_members_bit_identical(self):
        """Members that were never faulted must be unaffected by the other
        members' faults and resets — bit-identical trajectories (masked
        selects + member-independent batched math)."""
        untouched = [i for i in range(B) if i not in (NAN_MEMBER, PUSH_MEMBER)]
        np.testing.assert_array_equal(
            self.fault_xs[:, untouched], self.clean_xs[:, untouched]
        )
