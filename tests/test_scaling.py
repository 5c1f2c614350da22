"""Automatic equality-row equilibration (ocp/scaling.py) — the
IPOPT-nlp-scaling role (isrbd_example.py:361-369): derived per-row scales
must reproduce the hand-built isrbd vector's effect, and let a
user-defined mixed-unit problem (docs/CUSTOM_PROBLEMS.md) solve in f32
without manual unit analysis."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.scaling import auto_eq_scale, eq_row_gradient_norms
from srbd_horizon_tpu.ocp.spec import OCP, node_mask
from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions


def _al(ocp, outer_iters=6):
    return ALDDP(
        ocp,
        ddp_opts=DDPOptions(
            max_iters=15, alpha_converge_threshold=1e-12, beta=1e-3,
            cost_reduction_ths=1e-10,
        ),
        al_opts=ALOptions(outer_iters=outer_iters, rho0=1e3, tol=1e-5),
    )


class TestAutoEqScaleISRBD:
    def test_row_structure_matches_hand(self):
        """Auto scales must agree with the hand-built vector's structure:
        geometric rows (rel-vel, cz, lipzone) stay at 1; dynamics rows in
        newtons get ~1/(m·g)-magnitude scales (problems/isrbd.py:200-203).
        The NE linear rows land at 1/m (their gradient is the m·rddot
        column, not the residual magnitude) — same order as hand."""
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        ocp = auto_eq_scale(prob.ocp, prob.initial_state, prob.static_input)
        s = np.asarray(ocp.eq_scale)
        hand = np.asarray(prob.ocp.eq_scale)
        n_relvel, nc = 4, 4
        geo = list(range(n_relvel + nc)) + list(range(n_relvel + nc + 9, len(s)))
        np.testing.assert_array_equal(s[geo], 1.0)
        np.testing.assert_array_equal(hand[geo], 1.0)
        # force-unit rows: scaled down into the hand vector's decade
        m = prob.mass
        np.testing.assert_allclose(s[8:11], 1.0 / m, rtol=1e-6)     # NE lin
        np.testing.assert_allclose(s[11:13], hand[11:13], rtol=0.1)  # NE ang
        np.testing.assert_allclose(s[14:17], hand[14:17], rtol=0.2)  # LIP
        # never scaled up
        assert np.all(s <= 1.0) and np.all(s > 0.0)

    def test_f32_solve_matches_hand_scale(self):
        """The done-criterion A/B (VERDICT r3 item 3): the f32 AL solve
        with auto scales must reach the hand-scale feasibility level
        (measured: scaled viol 3.94e-4 auto vs 3.89e-4 hand)."""
        cfg = SRBDConfig(dtype=jnp.float32)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        x0 = prob.initial_state
        U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        viol = {}
        for name, ocp in [
            ("hand", prob.ocp),
            ("auto", auto_eq_scale(prob.ocp, x0, prob.static_input)),
        ]:
            solver = _al(ocp)
            st = jax.jit(solver.solve)(solver.init(x0, U0=U0), x0, ocp.params)
            assert bool(jnp.all(jnp.isfinite(st.sol.X))), name
            viol[name] = float(st.viol)
        assert viol["auto"] < 1e-3
        assert viol["auto"] < 2.0 * viol["hand"], viol

    def test_noop_without_eq_constraints(self):
        """An OCP with empty equality stacks passes through untouched."""
        from srbd_horizon_tpu.problems.srbd import build_srbd_problem

        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        ocp = dataclasses.replace(
            prob.ocp,
            stage_eq=lambda x, u, p: jnp.zeros((0,)),
            terminal_eq=lambda x, p: jnp.zeros((0,)),
            eq_scale=None, eq_scale_T=None,
        )
        out = auto_eq_scale(ocp, prob.initial_state)
        assert out.eq_scale is None and out.eq_scale_T is None


def _mixed_unit_ocp(ns=10, dt=0.05, mass=500.0, dtype=jnp.float32):
    """User-style hover problem with a deliberately nasty unit mix (the
    docs/CUSTOM_PROBLEMS.md scenario): a 500 kg point mass where thrust f
    is a decision variable tied to the acceleration input through a
    force-balance EQUALITY in newtons (gradient O(m)=500) next to a
    station-keeping equality in meters (gradient 1). Unscaled, one ρ
    cannot serve both rows in f32; auto_eq_scale must fix it."""
    g = 9.81
    z_ref = 1.0

    def split(u):
        return u[0:1], u[1:2]  # a (m/s²), f (N)

    def xdot(x, u, p):
        del p
        a, _ = split(u)
        return jnp.concatenate([x[1:2], a])

    def step(x, u, p, dt_):
        return x + dt_ * xdot(x, u, p)

    def stage_residual(x, u, p):
        del p
        a, f = split(u)
        return jnp.concatenate(
            [10.0 * (x[0:1] - z_ref), 1.0 * x[1:2], 0.1 * a, 1e-3 * f]
        )

    def terminal_residual(x, p):
        del p
        return jnp.concatenate([10.0 * (x[0:1] - z_ref), 1.0 * x[1:2]])

    def stage_eq(x, u, p):
        a, f = split(u)
        # force balance (newtons) + station-keeping band (meters; masked
        # to later nodes — it contradicts the pinned x0 before the mass
        # can climb, exactly the lipzone-mask pattern of isrbd)
        weight = jnp.full((1,), mass * g, x.dtype)
        return jnp.concatenate(
            [f - mass * a - weight, p["mask_station"] * (x[0:1] - z_ref)]
        )

    return OCP(
        ns=ns, dt=dt,
        state_layout=VarLayout([("z", 1), ("zdot", 1)]),
        input_layout=VarLayout([("a", 1), ("f", 1)]),
        step=step, xdot=xdot,
        stage_residual=stage_residual, terminal_residual=terminal_residual,
        stage_eq=stage_eq,
        params={"mask_station": node_mask(ns, 6, ns + 1, dtype)[:, None]},
    )


class TestCustomProblemAutoScale:
    def test_f32_custom_problem_solves_without_manual_scaling(self):
        ocp = _mixed_unit_ocp()
        x0 = jnp.array([0.8, 0.0], jnp.float32)
        scaled = auto_eq_scale(ocp, x0)
        s = np.asarray(scaled.eq_scale)
        np.testing.assert_allclose(s[0], 1.0 / 500.0, rtol=1e-6)
        np.testing.assert_allclose(s[1], 1.0)
        solver = _al(scaled, outer_iters=8)
        st = jax.jit(solver.solve)(solver.init(x0), x0, scaled.params)
        assert bool(jnp.all(jnp.isfinite(st.sol.X)))
        # raw feasibility: newtons row to sub-newton, meters row to sub-mm
        ns = ocp.ns
        ps = {k: v[:ns] for k, v in ocp.params.items()}
        h = jax.vmap(ocp.stage_eq)(st.sol.X[:ns], st.sol.U, ps)
        assert float(jnp.max(jnp.abs(h[:, 0]))) < 1.0       # newtons
        assert float(jnp.max(jnp.abs(h[6:, 1]))) < 1e-3      # meters (masked zone)
        # and the mass actually reaches and holds the station (stage-
        # constrained nodes; node ns has no stage_eq and only soft cost)
        np.testing.assert_allclose(
            np.asarray(st.sol.X[6:ns, 0]), 1.0, atol=1e-3
        )


class TestAutoStiffness:
    """auto_eq_scale(state_row_stiffness=...): state-only rows (zero
    u-gradient — their AL penalty bypasses Quu) get the stiffness
    multiplier automatically; input-touching rows keep 1."""

    def test_isrbd_state_rows_detected(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        ocp = auto_eq_scale(
            prob.ocp, prob.initial_state, prob.static_input,
            state_row_stiffness=100.0,
        )
        w = np.asarray(ocp.eq_rho_weight)
        # geometric rows (relvel 0:4, cz 4:8, lipzone 17:21) are
        # state-only; NE/LIP dynamics rows (8:17) touch inputs
        np.testing.assert_array_equal(w[0:8], 100.0)
        np.testing.assert_array_equal(w[8:17], 1.0)
        np.testing.assert_array_equal(w[17:21], 100.0)
        np.testing.assert_array_equal(np.asarray(ocp.eq_rho_weight_T), 100.0)

    def test_custom_problem_stiffened_solve(self):
        """The mixed-unit hover problem with automatic scaling AND
        stiffness: the meters station-keeping row (state-only) is driven
        harder and lands tighter than with scaling alone."""
        ocp = _mixed_unit_ocp()
        x0 = jnp.array([0.8, 0.0], jnp.float32)
        plain = auto_eq_scale(ocp, x0)
        stiff = auto_eq_scale(ocp, x0, state_row_stiffness=100.0)
        w = np.asarray(stiff.eq_rho_weight)
        np.testing.assert_array_equal(w, [1.0, 100.0])  # force row, z row
        ns = ocp.ns

        def solve(o):
            solver = _al(o, outer_iters=8)
            st = jax.jit(solver.solve)(solver.init(x0), x0, o.params)
            ps = {k: v[:ns] for k, v in o.params.items()}
            h = jax.vmap(o.stage_eq)(st.sol.X[:ns], st.sol.U, ps)
            return float(jnp.max(jnp.abs(h[6:, 1])))

        v_plain, v_stiff = solve(plain), solve(stiff)
        assert v_stiff < 1e-3
        assert v_stiff <= v_plain * 1.5, (v_plain, v_stiff)
