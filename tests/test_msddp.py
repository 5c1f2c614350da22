"""MS-DDP solver tests (SURVEY.md §4): analytic LQR parity, LIP problem
convergence, batched solves."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _lqr_ocp(ns=15, dt=1.0):
    """Double integrator, pure LQR: residual form so GN-DDP is exact."""
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt * dt], [dt]])
    sqQ = np.sqrt(np.diag([1.0, 0.1]))
    sqR = np.sqrt(np.array([[0.01]]))
    sqQf = np.sqrt(np.diag([10.0, 1.0]))

    Aj, Bj = jnp.array(A), jnp.array(B)

    def step(x, u, p, _dt):
        return Aj @ x + Bj @ u

    ocp = OCP(
        ns=ns,
        dt=dt,
        state_layout=VarLayout([("x", 2)]),
        input_layout=VarLayout([("u", 1)]),
        step=step,
        xdot=lambda x, u, p: None,
        stage_residual=lambda x, u, p: jnp.concatenate(
            [jnp.array(sqQ) @ x, jnp.array(sqR) @ u]
        ),
        terminal_residual=lambda x, p: jnp.array(sqQf) @ x,
        params={"dummy": jnp.zeros((ns + 1, 1))},
    )
    return ocp, A, B, sqQ.T @ sqQ, sqR.T @ sqR, sqQf.T @ sqQf


def _lqr_reference(A, B, Q, R, Qf, x0, ns):
    """Finite-horizon discrete Riccati recursion (NumPy float64 oracle).
    Cost convention matches the solver: Σ xᵀQx + uᵀRu (no ½)."""
    P = Qf
    Ks = []
    for _ in range(ns):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    xs, us = [x0], []
    x = x0
    for n in range(ns):
        u = -Ks[n] @ x
        us.append(u)
        x = A @ x + B @ u
        xs.append(x)
    return np.array(xs), np.array(us)


class TestLQRParity:
    def test_matches_riccati(self):
        ns = 15
        ocp, A, B, Q, R, Qf = _lqr_ocp(ns)
        solver = MSDDP(ocp, DDPOptions(max_iters=50, mu0=1e-9))
        x0 = jnp.array([1.5, -0.3])
        sol = solver.init(x0)
        sol = jax.jit(solver.solve)(sol, x0, ocp.params)
        assert bool(sol.converged)
        xs_ref, us_ref = _lqr_reference(
            A, B, Q, R, Qf, np.array([1.5, -0.3]), ns
        )
        np.testing.assert_allclose(np.asarray(sol.U), us_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol.X), xs_ref, atol=1e-6)
        assert float(sol.defect_norm) < 1e-8

    def test_warm_start_identity(self):
        """Re-solving from the optimum must keep it (and exit quickly)."""
        ns = 15
        ocp, *_ = _lqr_ocp(ns)
        solver = MSDDP(ocp, DDPOptions(max_iters=50))
        x0 = jnp.array([1.5, -0.3])
        sol1 = solver.solve(solver.init(x0), x0, ocp.params)
        sol2 = solver.solve(sol1, x0, ocp.params)
        np.testing.assert_allclose(
            np.asarray(sol2.U), np.asarray(sol1.U), atol=1e-8
        )
        assert int(sol2.iterations) <= 2


class TestLIPSolve:
    def setup_method(self):
        self.cfg = SRBDConfig(dtype=jnp.float64)
        self.prob = build_lip_problem(self.cfg, kangaroo_line_feet())
        self.solver = MSDDP(
            self.prob.ocp,
            DDPOptions(max_iters=100, alpha_converge_threshold=1e-12, beta=1e-3),
        )

    def test_standing_solve(self):
        """From the nominal state with standing parameters the solution must
        keep the CoM near com, satisfy the contact constraints, and converge
        with tiny defects (the dlip_example.py standing regime)."""
        x0 = self.prob.initial_state
        params = self.prob.ocp.params
        sol = jax.jit(self.solver.solve)(self.solver.init(x0), x0, params)
        d = self.solver.solution_dict(sol)

        assert float(sol.defect_norm) < 1e-6
        # CoM stays near nominal
        np.testing.assert_allclose(
            np.asarray(d["r"][-1]), np.asarray(self.prob.com), atol=2e-2
        )
        # cz_tracking: contact heights pinned at reference (1e6 penalty)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(d[f"c{i}"][:, 2]), 0.0, atol=1e-4
            )
        # cdotxy_tracking: stance contacts must not slide
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(d[f"cdot{i}"][:, :2]), 0.0, atol=1e-4
            )

    def test_velocity_tracking(self):
        """Terminal rdot_ref pulls the CoM velocity (the teleop path,
        dlip_example.py:118-127)."""
        x0 = self.prob.initial_state
        params = dict(self.prob.ocp.params)
        rdot_ref = params["rdot_ref"].at[-1].set(jnp.array([0.3, 0.0, 0.0]))
        params["rdot_ref"] = rdot_ref
        sol = self.solver.solve(self.solver.init(x0), x0, params)
        d = self.solver.solution_dict(sol)
        # terminal CoM velocity should move toward the reference
        assert float(d["rdot"][-1, 0]) > 0.1

    def test_batched_solve(self):
        """vmap over scenarios: the batched scenario axis (SURVEY.md §2.3)."""
        B = 4
        x0 = jnp.tile(self.prob.initial_state[None], (B, 1))
        x0 = x0.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))  # vary CoM x
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            self.prob.ocp.params,
        )
        sols0 = jax.vmap(self.solver.init)(x0)
        sols = jax.jit(jax.vmap(self.solver.solve))(sols0, x0, params)
        assert sols.X.shape[0] == B
        assert float(jnp.max(sols.defect_norm)) < 1e-6
        # batched results must match individual solves
        sol_single = self.solver.solve(
            self.solver.init(x0[2]), x0[2], self.prob.ocp.params
        )
        np.testing.assert_allclose(
            np.asarray(sols.X[2]), np.asarray(sol_single.X), atol=1e-6
        )


class TestX0Pin:
    def test_x0_gap_is_a_defect(self):
        """A warm start whose X disagrees with the commanded x0 must not be
        returned as 'converged': node 0 is pinned to x0 at solve entry, so
        the gap surfaces as the node-0 shooting defect and the solver
        re-solves from the true initial state. Regression: before the pin,
        a lower-cost stale plan (the unperturbed equilibrium) won the line
        search against every rollout from the perturbed x0 and the solve
        was a no-op with X[0] != x0."""
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=100, alpha_converge_threshold=1e-12,
                       beta=1e-3),
        )
        x0 = prob.initial_state
        # equilibrium warm start (zero cost) ...
        sol = solver.init(x0, U0=jnp.tile(prob.static_input[None],
                                          (prob.ocp.ns, 1)))
        # ... but the commanded initial state is elsewhere
        x0_pert = x0.at[0].add(0.05)
        out = jax.jit(solver.solve)(sol, x0_pert, prob.ocp.params)
        np.testing.assert_allclose(
            np.asarray(out.X[0]), np.asarray(x0_pert), atol=0.0
        )
        assert float(out.defect_norm) < 1e-8
        # the solution genuinely paid for the offset (not the stale plan)
        assert float(out.cost) > 1.0
