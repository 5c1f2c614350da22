"""Golden-trajectory parity: the JAX MS-DDP solver vs the fully
independent NumPy iLQR oracle (tests/oracle_ddp.py) on the LIP problem —
the SURVEY.md §4 parity criterion (≤1e-4 trajectory agreement)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP

from oracle_ddp import LIPOracleProblem, solve_ilqr


class TestGoldenParity:
    def _solve_both(self, rdot_terminal):
        robot = kangaroo_line_feet()
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, robot)
        solver = MSDDP(
            prob.ocp,
            DDPOptions(
                max_iters=80, alpha_converge_threshold=1e-12, beta=1e-3,
                cost_reduction_ths=1e-14,
            ),
        )
        params = dict(prob.ocp.params)
        params["rdot_ref"] = params["rdot_ref"].at[-1].set(
            jnp.asarray(rdot_terminal)
        )
        x0 = prob.initial_state
        sol = solver.solve(solver.init(x0), x0, params)

        oracle = LIPOracleProblem(robot.com, robot.foot_positions)
        oracle.rdot_ref[-1] = np.asarray(rdot_terminal)
        Xo, Uo, cost_o = solve_ilqr(oracle, oracle.initial_state())
        return sol, Xo, Uo, cost_o

    def test_standing(self):
        sol, Xo, Uo, cost_o = self._solve_both([0.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(sol.X), Xo, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sol.U), Uo, atol=1e-4)
        np.testing.assert_allclose(float(sol.cost), cost_o, rtol=1e-6, atol=1e-9)

    def test_velocity_command(self):
        sol, Xo, Uo, cost_o = self._solve_both([0.25, -0.1, 0.0])
        np.testing.assert_allclose(np.asarray(sol.X), Xo, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sol.U), Uo, atol=1e-4)
        np.testing.assert_allclose(float(sol.cost), cost_o, rtol=1e-6, atol=1e-9)


class TestGoldenParitySRBD:
    def test_srbd_standing(self):
        """SRBD golden parity: same problem, independent NumPy iLQR with
        finite-difference Jacobians (quaternions, forces, Newton–Euler)."""
        from oracle_ddp import SRBDOracleProblem, solve_ilqr
        from srbd_horizon_tpu.problems.srbd import build_srbd_problem

        robot = kangaroo_line_feet()
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, robot)
        solver = MSDDP(
            prob.ocp,
            DDPOptions(
                max_iters=80, alpha_converge_threshold=1e-12, beta=1e-3,
                cost_reduction_ths=1e-14,
            ),
        )
        x0 = prob.initial_state
        ns = cfg.ns
        U0 = jnp.tile(prob.static_input[None], (ns, 1))
        sol = solver.solve(solver.init(x0, U0=U0), x0, prob.ocp.params)

        oracle = SRBDOracleProblem(
            robot.mass, robot.inertia, robot.com, robot.foot_positions
        )
        # same warm start as the JAX solve for a fair comparison
        Xo, Uo, cost_o = solve_ilqr(
            oracle, oracle.initial_state(), U0=oracle.static_input()
        )
        np.testing.assert_allclose(np.asarray(sol.X), Xo, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sol.U), Uo, atol=2e-4)
        np.testing.assert_allclose(float(sol.cost), cost_o, rtol=1e-5,
                                   atol=1e-9)
