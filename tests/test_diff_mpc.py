"""Differentiable MPC (solvers/diff.py): implicit-function-theorem VJPs
through the converged MS-DDP solve, and unrolled fixed-iteration AD.

Gradient ground truth is central finite differences of the full
(solve → outer loss) pipeline in float64. On the LIP problem the dynamics
are linear and the residuals affine, so the Gauss-Newton Hessian used by
the implicit VJP is the exact Hessian and gradients must match FD tightly.
On SRBD (nonlinear) the implicit gradient is GN-accurate; it is checked
as a usable descent direction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.solvers.diff import implicit_solve, unrolled_solve
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _tight_opts(**kw):
    return DDPOptions(
        max_iters=100, alpha_converge_threshold=1e-12, beta=1e-3,
        cost_reduction_ths=1e-12, **kw
    )


def _lip_setup():
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_lip_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(prob.ocp, _tight_opts())
    x0 = prob.initial_state
    sol = solver.init(x0, U0=jnp.tile(prob.static_input[None],
                                      (prob.ocp.ns, 1)))
    return prob, solver, sol, x0


def _outer_loss_fn(solver, fsolve, target_vx):
    """Imitation-style outer loss: realized CoM x-velocity of the plan
    should track `target_vx` — a scalar function of (x0, params) THROUGH
    the solver."""

    def loss(sol, x0, params):
        out = fsolve(sol, x0, params)
        vx = out.X[:, solver.ocp.state_layout.slices["rdot"]][:, 0]
        return jnp.sum((vx - target_vx) ** 2) + 1e-3 * out.cost

    # NOTE: gradients of the implicit solve must run under jit — the
    # eager-dispatch path of JAX's second-order transpose crashes natively
    # (free(): invalid pointer) on this jax build; jit compiles it fine.
    return jax.jit(loss)


class TestImplicitLIP:
    def test_gradient_matches_fd(self):
        """d loss / d rdot_ref (a node-indexed reference parameter) via the
        implicit VJP vs central finite differences."""
        prob, solver, sol, x0 = _lip_setup()
        fsolve = implicit_solve(solver)
        loss = _outer_loss_fn(solver, fsolve, 0.15)

        params = dict(prob.ocp.params)
        g = jax.jit(jax.grad(loss, argnums=2))(sol, x0, params)["rdot_ref"]
        g = np.asarray(g)

        # FD at a handful of (node, dim) coordinates incl. interior + last
        base = float(loss(sol, x0, params))
        eps = 1e-6
        coords = [(5, 0), (12, 0), (20, 0), (8, 1)]
        for n, d in coords:
            pp = dict(params)
            pp["rdot_ref"] = params["rdot_ref"].at[n, d].add(eps)
            lp = float(loss(sol, x0, pp))
            pp["rdot_ref"] = params["rdot_ref"].at[n, d].add(-eps)
            lm = float(loss(sol, x0, pp))
            fd = (lp - lm) / (2 * eps)
            assert np.isfinite(fd)
            np.testing.assert_allclose(
                g[n, d], fd, rtol=2e-4, atol=1e-8 * max(1.0, abs(base)),
                err_msg=f"coord ({n},{d})",
            )

    def test_x0_gradient_matches_fd(self):
        prob, solver, sol, x0 = _lip_setup()
        fsolve = implicit_solve(solver)
        loss = _outer_loss_fn(solver, fsolve, 0.1)
        g = np.asarray(jax.jit(jax.grad(loss, argnums=1))(sol, x0, dict(prob.ocp.params)))
        eps = 1e-6
        for i in (0, 2, prob.ocp.state_layout.slices["rdot"].start):
            xp = x0.at[i].add(eps)
            xm = x0.at[i].add(-eps)
            fd = (
                float(loss(sol, xp, dict(prob.ocp.params)))
                - float(loss(sol, xm, dict(prob.ocp.params)))
            ) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=5e-4, atol=1e-7,
                                       err_msg=f"x0[{i}]")

    def test_warmstart_gradient_is_zero(self):
        prob, solver, sol, x0 = _lip_setup()
        fsolve = implicit_solve(solver)
        loss = _outer_loss_fn(solver, fsolve, 0.1)
        g_sol = jax.jit(jax.grad(loss, argnums=0, allow_int=True))(
            sol, x0, dict(prob.ocp.params)
        )
        assert float(jnp.max(jnp.abs(g_sol.X))) == 0.0
        assert float(jnp.max(jnp.abs(g_sol.U))) == 0.0


class TestUnrolled:
    def test_unrolled_matches_solver_trajectory(self):
        """The fixed-iteration solve reproduces solver.solve's trajectory
        when both run the same accepted full steps."""
        prob, solver, sol, x0 = _lip_setup()
        fun = unrolled_solve(solver, n_iters=12)
        out_u = fun(sol, x0, prob.ocp.params)
        out_s = solver.solve(sol, x0, prob.ocp.params)
        np.testing.assert_allclose(
            np.asarray(out_u.X), np.asarray(out_s.X), atol=1e-8
        )
        assert float(out_u.defect_norm) < 1e-9

    def test_unrolled_gradient_matches_fd(self):
        prob, solver, sol, x0 = _lip_setup()
        fun = unrolled_solve(solver, n_iters=8)
        loss = _outer_loss_fn(solver, fun, 0.15)
        params = dict(prob.ocp.params)
        # evaluate at a NON-degenerate point: at the exact standing
        # equilibrium the solver's gradient is 0, the Armijo test sits on
        # its accept/reject branch boundary, and AD (reject branch) and FD
        # (accept branch) legitimately disagree — a measure-zero point.
        # With an active velocity reference both sample the same branch.
        params["rdot_ref"] = params["rdot_ref"].at[:, 0].set(0.1)
        g = np.asarray(jax.jit(jax.grad(loss, argnums=2))(sol, x0, params)["rdot_ref"])
        eps = 1e-6
        n, d = 10, 0
        pp = dict(params)
        pp["rdot_ref"] = params["rdot_ref"].at[n, d].add(eps)
        lp = float(loss(sol, x0, pp))
        pp["rdot_ref"] = params["rdot_ref"].at[n, d].add(-eps)
        lm = float(loss(sol, x0, pp))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(g[n, d], fd, rtol=2e-4)


class TestImplicitSRBD:
    @pytest.fixture(scope="class")
    def srbd(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(prob.ocp, _tight_opts())
        x0 = prob.initial_state
        sol = solver.init(
            x0, U0=jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        )
        return prob, solver, sol, x0

    def test_gradient_is_descent_direction(self, srbd):
        """GN-implicit gradients on the nonlinear SRBD problem: stepping
        against the gradient must reduce the outer loss (reference-shaping
        use case: tune rdot_ref so the plan reaches a target velocity)."""
        prob, solver, sol, x0 = srbd
        fsolve = implicit_solve(solver)
        loss = _outer_loss_fn(solver, fsolve, 0.2)
        params = dict(prob.ocp.params)
        l0 = float(loss(sol, x0, params))
        g = jax.jit(jax.grad(loss, argnums=2))(sol, x0, params)
        gnorm2 = sum(
            float(jnp.sum(v * v)) for v in jax.tree.leaves(g)
        )
        assert gnorm2 > 0.0
        for step in (1e-2, 1e-3, 1e-4):
            trial = jax.tree.map(lambda p, gi: p - step * gi, params, g)
            l1 = float(loss(sol, x0, trial))
            if l1 < l0 - 1e-12:
                return
        raise AssertionError(
            f"no descent along -grad from loss {l0} (gnorm² {gnorm2})"
        )

    def test_gradient_descent_recovers_reference(self, srbd):
        """End-to-end learning demo: recover a hidden rdot_ref from the
        plan it produces (inverse MPC / imitation), by Adam-free plain
        gradient descent through the solver."""
        prob, solver, sol, x0 = srbd
        fsolve = implicit_solve(solver)
        params = dict(prob.ocp.params)
        hidden = params["rdot_ref"].at[:, 0].set(0.25)
        target = fsolve(sol, x0, {**params, "rdot_ref": hidden}).X

        def loss(rref):
            out = fsolve(sol, x0, {**params, "rdot_ref": rref})
            return jnp.mean((out.X - target) ** 2)

        rref = params["rdot_ref"]
        l0 = float(loss(rref))
        gfun = jax.jit(jax.grad(loss))
        lr = 2e2
        for _ in range(60):
            rref = rref - lr * gfun(rref)
        l1 = float(loss(rref))
        assert l1 < 0.05 * l0, (l0, l1)
