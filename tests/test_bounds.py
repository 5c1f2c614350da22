"""Variable box-bound tests — the reference's `setBounds` capability
(isrbd_example.py:188-221 force boxes, :200 ±max_contact_force, :425-431
online re-pinning; global cdot velocity bounds via the steps_phase
max_velocity kwarg, isrbd_example.py:417).

The AL solver must (a) keep a BINDING bound satisfied to tolerance while
still converging, and (b) leave the solution unchanged when bounds are
slack. Checked on a minimal double integrator (fast, exact) and on the
full ISRBD problem (a cdot bound binding during foot repositioning)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP, unbounded
from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions


def _double_integrator(ns=20, dt=0.1, v_max=None, a_max=None):
    """min Σ‖0.1 a‖² s.t. reach p=1, optional v ≤ v_max, |a| ≤ a_max."""
    state_layout = VarLayout([("p", 1), ("v", 1)])
    input_layout = VarLayout([("a", 1)])

    def xdot(x, u, p):
        del p
        return jnp.stack([x[1], u[0]])

    def step(x, u, p, dt_):
        return x + dt_ * xdot(x, u, p)

    def stage_residual(x, u, p):
        del x, p
        return 0.1 * u

    def terminal_residual(x, p):
        del p
        return jnp.stack([10.0 * (x[0] - 1.0), x[1]])

    x_lb = x_ub = u_lb = u_ub = None
    if v_max is not None:
        x_lb, x_ub = unbounded(ns + 1, 2, jnp.float64)
        x_ub = x_ub.at[:, 1].set(v_max)
    if a_max is not None:
        u_lb, u_ub = unbounded(ns, 1, jnp.float64)
        u_lb = u_lb.at[:, 0].set(-a_max)
        u_ub = u_ub.at[:, 0].set(a_max)

    return OCP(
        ns=ns, dt=dt, state_layout=state_layout, input_layout=input_layout,
        step=step, xdot=xdot,
        stage_residual=stage_residual, terminal_residual=terminal_residual,
        x_lb=x_lb, x_ub=x_ub, u_lb=u_lb, u_ub=u_ub,
        params={"dummy": jnp.zeros((ns + 1, 1), jnp.float64)},
    )


def _solve(ocp, outer_iters=10):
    solver = ALDDP(
        ocp,
        ddp_opts=DDPOptions(max_iters=30, alpha_converge_threshold=1e-12,
                            beta=1e-3, cost_reduction_ths=1e-12),
        al_opts=ALOptions(outer_iters=outer_iters, rho0=1e2, tol=1e-8),
    )
    x0 = jnp.zeros(2, jnp.float64)
    st = jax.jit(solver.solve)(solver.init(x0), x0, ocp.params)
    return solver, st


class TestDoubleIntegratorBounds:
    def test_velocity_bound_binds_and_converges(self):
        """v ≤ 0.3 while the unbounded optimum cruises at ~0.5: the bound
        must bind (v rides it) and the AL must still converge."""
        _, st_free = _solve(_double_integrator())
        v_free = np.asarray(st_free.sol.X[:, 1])
        assert v_free.max() > 0.4  # the bound is genuinely active below

        _, st = _solve(_double_integrator(v_max=0.3))
        v = np.asarray(st.sol.X[:, 1])
        assert v.max() <= 0.3 + 1e-3, v.max()
        assert v.max() >= 0.29  # binding, not just slack
        assert float(st.viol) < 1e-3

    def test_input_bound_binds_and_converges(self):
        """|a| ≤ 0.4 while the unbounded optimum uses ~±1: bang-bang-ish
        clipping at the box, feasible to tolerance."""
        _, st_free = _solve(_double_integrator())
        a_free = np.asarray(st_free.sol.U[:, 0])
        assert np.abs(a_free).max() > 0.6

        _, st = _solve(_double_integrator(a_max=0.4))
        a = np.asarray(st.sol.U[:, 0])
        assert np.abs(a).max() <= 0.4 + 1e-3, np.abs(a).max()
        assert np.abs(a).max() >= 0.39
        assert float(st.viol) < 1e-3

    def test_slack_bounds_do_not_change_solution(self):
        """Bounds far from the optimum must be inert (multipliers stay 0)."""
        _, st_free = _solve(_double_integrator())
        _, st = _solve(_double_integrator(v_max=100.0, a_max=100.0))
        np.testing.assert_allclose(
            np.asarray(st.sol.X), np.asarray(st_free.sol.X),
            rtol=1e-6, atol=1e-8,
        )
        assert float(jnp.max(st.mu_x_ub)) == 0.0
        assert float(jnp.max(st.mu_u_ub)) == 0.0

    def test_params_override_bounds(self):
        """Per-solve bound override through the params pytree (the online
        re-pinning channel, isrbd_example.py:425-431)."""
        ocp = _double_integrator(v_max=100.0)
        solver = ALDDP(
            ocp,
            ddp_opts=DDPOptions(max_iters=30, alpha_converge_threshold=1e-12,
                                beta=1e-3, cost_reduction_ths=1e-12),
            al_opts=ALOptions(outer_iters=10, rho0=1e2, tol=1e-8),
        )
        x0 = jnp.zeros(2, jnp.float64)
        x_lb, x_ub = unbounded(ocp.ns + 1, 2, jnp.float64)
        x_ub = x_ub.at[:, 1].set(0.3)
        params = dict(ocp.params, x_lb=x_lb, x_ub=x_ub)
        st = jax.jit(solver.solve)(solver.init(x0), x0, params)
        v = np.asarray(st.sol.X[:, 1])
        assert v.max() <= 0.3 + 1e-3
        assert float(st.viol) < 1e-3


class TestBatchedDeepLineSearch:
    def test_batched_fan_deepens_to_small_alpha(self):
        """The batched solver path (_iteration_batch) must deepen its α fan
        past the first width-4 chunk when every candidate rejects — the
        v-bounded double integrator stalls at viol≈4e-2 under a truncated
        fan and converges to ~1e-10 with deepening (VERDICT weak #4 /
        reference backtrack-to-1e-12, dsrbd_example.py:57)."""
        ocp = _double_integrator(v_max=0.3)
        solver = ALDDP(
            ocp,
            ddp_opts=DDPOptions(max_iters=30, alpha_converge_threshold=1e-12,
                                beta=1e-3, cost_reduction_ths=1e-12),
            al_opts=ALOptions(outer_iters=10, rho0=1e2, tol=1e-8),
        )
        B = 2
        x0 = jnp.stack([jnp.zeros(2), jnp.array([0.0, 0.05])])
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), ocp.params
        )
        st0 = jax.vmap(solver.init)(x0)
        st = jax.jit(solver.solve_batch)(st0, x0, params)
        v = np.asarray(st.sol.X[..., 1])
        assert v.max() <= 0.3 + 1e-3, v.max()
        assert float(jnp.max(st.viol)) < 1e-3
        # member-for-member equivalence with the vmapped per-instance path
        ref = jax.vmap(solver.solve)(st0, x0, params)
        np.testing.assert_allclose(
            np.asarray(st.sol.X), np.asarray(ref.sol.X), rtol=1e-6, atol=1e-8
        )


class TestISRBDContactVelocityBound:
    def test_cdot_bound_binds(self):
        """Reposition one foot pair 0.18 m sideways (the rel-position cost
        pulls it back) under cdot ∈ ±0.1 m/s: the contact-velocity box
        (SRBDConfig.max_contact_velocity — reference steps_phase
        max_velocity role) must bind and the AL must converge."""
        cfg = SRBDConfig(dtype=jnp.float64, max_contact_velocity=0.1)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        solver = ALDDP(
            prob.ocp,
            ddp_opts=DDPOptions(max_iters=40, alpha_converge_threshold=1e-12,
                                beta=1e-3, cost_reduction_ths=1e-10),
            # 12 outers: with the scaled equality stack (OCP.eq_scale) the
            # NE rows are no longer hyper-stiffened ~392² relative to the
            # meter rows, so this adversarial repositioning needs more
            # multiplier updates to reach the same scaled tolerance
            # (measured: viol 1.75e-2 at 8 outers, 3.0e-3 at 12).
            al_opts=ALOptions(outer_iters=12, rho0=1e3, rho_growth=4.0,
                              tol=1e-5),
        )
        ns = prob.ocp.ns
        # displace the right-leg pair (contacts 2,3) sideways so the
        # w_rel residual demands ~0.12 m of travel over the 1 s horizon —
        # more than the bound allows at mean speed, so it saturates
        x0 = prob.initial_state
        sl2 = prob.ocp.state_layout.slices["c2"]
        sl3 = prob.ocp.state_layout.slices["c3"]
        x0 = x0.at[sl2.start + 1].add(0.12).at[sl3.start + 1].add(0.12)
        U0 = jnp.tile(prob.static_input[None], (ns, 1))
        st = jax.jit(solver.solve)(solver.init(x0, U0=U0), x0, prob.ocp.params)
        d = solver.solution_dict(st)
        cdot_y = np.concatenate(
            [np.asarray(d["cdot2"][:, 1]), np.asarray(d["cdot3"][:, 1])]
        )
        vmax = cfg.max_contact_velocity
        assert np.abs(cdot_y).max() <= vmax + 5e-3, np.abs(cdot_y).max()
        assert np.abs(cdot_y).max() >= 0.9 * vmax  # binding (rides the box)
        assert float(st.viol) < 5e-3
        # the foot actually travelled toward its target
        y_travel = float(d["c2"][-1, 1] - d["c2"][0, 1])
        assert y_travel < -0.05
