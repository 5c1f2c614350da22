"""Differentiable MPC — gradients THROUGH the MS-DDP solve.

A capability beyond the reference's surface (its C++ pyddp solver is a
black box; reference ddp.py:96-106 returns plain numpy): because the whole
solve here is a pure jittable function, the optimal plan can be
differentiated with respect to the problem parameters (references, gains,
gait switches in the `params` pytree) and the initial state. That turns
the MPC controller into a trainable layer: imitation of expert
trajectories, automatic gain tuning, reference shaping — all by gradient
descent on TPU, batched with `vmap`.

Two mechanisms, both exposed as functions of a built `MSDDP` solver:

`implicit_solve(solver)` → a drop-in `solve(sol, x0, params)` with a
custom VJP derived from the STATIONARITY of the converged solution
(Amos & Kolter, "Differentiable MPC for End-to-end Planning and Control",
NeurIPS 2018 — PAPERS.md). At convergence the control trajectory U*
minimizes the reduced objective

    φ(U; x0, θ) = Σ_n ‖ρ_n(x_n(U), u_n, θ)‖² + ‖ρ_N(x_N(U), θ)‖²,

where x(U) is the dynamically-feasible rollout (multiple-shooting defects
are ≈0 at convergence), so ∇_U φ(U*, x0, θ) = 0 and the implicit function
theorem gives

    dU*/dθ = −(∇²_UU φ)⁻¹ ∇²_{Uθ} φ.

The VJP therefore needs ONE linear solve with the Gauss-Newton Hessian of
φ — and that solve IS an LQR problem with the converged linearization
(A, B, Gram quadratics), performed by a Riccati sweep in O(ns) instead of
factorizing the (ns·nu)² condensed Hessian. The mixed second-order terms
are delegated to JAX AD (a VJP of the gradient function). Cost of one
backward pass ≈ one extra solver iteration, independent of how many
iterations the forward solve took — and no memory scales with iteration
count (contrast `unrolled_solve`).

Exactness: with the Gauss-Newton Hessian the VJP is exact for
linear-quadratic problems (the LIP: linear dynamics, affine residuals) and
Gauss-Newton-accurate (error O(residual·curvature)) for nonlinear ones
(SRBD) — the same approximation the solver itself converges with.
tests/test_diff_mpc.py checks the LIP gradients against finite
differences and SRBD gradients for descent-direction validity.

`unrolled_solve(solver, n_iters, ls_width)` → a fixed-iteration,
`while_loop`-free solve that standard JAX reverse AD differentiates
end-to-end (each iteration `jax.checkpoint`ed so memory stays O(1) in
iteration count). Exact derivatives OF THE COMPUTED ITERATE (not the
idealized optimum); useful when the solve is cut off before convergence
(RTI mode) where the implicit assumption does not hold.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.solvers.msddp import DDPSolution, MSDDP, _IterState


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _feasible_rollout(solver: MSDDP, U, x0, params):
    """Open-loop dynamics rollout X(U; x0, θ) — the map whose composition
    with the cost defines the reduced objective φ."""
    ocp = solver.ocp
    ns, dt = ocp.ns, ocp.dt
    p_stage = {k: v[:ns] for k, v in params.items()}

    def node(x, inp):
        u, p = inp
        return ocp.step(x, u, p, dt), x

    x_fin, Xs = jax.lax.scan(node, x0, (U, p_stage))
    return jnp.concatenate([Xs, x_fin[None]], axis=0)


def _reduced_objective(solver: MSDDP, U, x0, params):
    X = _feasible_rollout(solver, U, x0, params)
    return solver.total_cost(X, U, params)


def _lqr_hessian_solve(solver: MSDDP, lin, b, reg=1e-9):
    """q = H⁻¹ b where H = ∇²_UU φ in Gauss-Newton form — solved as the
    LQR subproblem  min_δU ½ δUᵀ H δU − bᵀ δU  (δx₀ = 0, defects = 0)
    via one Riccati backward/forward sweep over the converged
    linearization. b and the returned q have shape (ns, nu)."""
    nx, nu = solver.ocp.nx, solver.ocp.nu
    dtype = b.dtype
    A, B, Jx, Ju = lin["A"], lin["B"], lin["Jx"], lin["Ju"]
    Jt = lin["Jt"]

    Vxx_T = 2.0 * Jt.T @ Jt
    Vx_T = jnp.zeros((nx,), dtype)
    I_u = jnp.eye(nu, dtype=dtype)

    def node(carry, inp):
        Vx, Vxx = carry
        A_, B_, Jx_, Ju_, b_ = inp
        lxx = 2.0 * Jx_.T @ Jx_
        luu = 2.0 * Ju_.T @ Ju_
        lux = 2.0 * Ju_.T @ Jx_
        Qx = A_.T @ Vx
        Qu = -b_ + B_.T @ Vx
        Qxx = lxx + A_.T @ Vxx @ A_
        Quu = luu + B_.T @ Vxx @ B_ + reg * I_u
        Qux = lux + B_.T @ Vxx @ A_
        chol = jax.scipy.linalg.cho_factor(Quu)
        kK = -jax.scipy.linalg.cho_solve(
            chol, jnp.concatenate([Qu[:, None], Qux], axis=1)
        )
        k, K = kK[:, 0], kK[:, 1:]
        Vx_new = Qx + K.T @ Qu + Qux.T @ k + K.T @ Quu @ k
        Vxx_new = Qxx + K.T @ Qux + Qux.T @ K + K.T @ Quu @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (k, K)

    (_, _), (ks, Ks) = jax.lax.scan(
        node, (Vx_T, Vxx_T), (A, B, Jx, Ju, b), reverse=True
    )

    def fwd(dx, inp):
        A_, B_, k_, K_ = inp
        du = k_ + K_ @ dx
        return A_ @ dx + B_ @ du, du

    _, q = jax.lax.scan(fwd, jnp.zeros((nx,), dtype), (A, B, ks, Ks))
    return q


# ---------------------------------------------------------------------------
# implicit differentiation (custom VJP via stationarity)
# ---------------------------------------------------------------------------


def implicit_solve(solver: MSDDP):
    """Wrap `solver.solve` with the implicit-function-theorem VJP.

    Returns `f(sol, x0, params) -> DDPSolution` differentiable w.r.t.
    `x0` and `params` (the warm-start `sol` correctly gets zero gradient —
    at convergence the solution does not depend on it). Compose with
    `jax.vmap` for batched learning, `jax.grad` for outer-loss training."""

    @jax.custom_vjp
    def _solve(sol, x0, params):
        return solver.solve(sol, x0, params)

    def _fwd(sol, x0, params):
        out = _solve(sol, x0, params)
        return out, (sol, out.U, x0, params)

    def _bwd(res, cot: DDPSolution):
        sol, U, x0, params = res

        # 1. pull the X cotangent back through the feasible rollout:
        #    X* = rollout(U*, x0, θ) ⇒ direct (x0, θ) parts + a U part
        _, roll_vjp = jax.vjp(
            lambda U_, x0_, p_: _feasible_rollout(solver, U_, x0_, p_),
            U, x0, params,
        )
        U_bar_r, x0_bar_r, p_bar_r = roll_vjp(cot.X)
        u_total = cot.U + U_bar_r

        # 2. envelope term for the cost output: cost* = φ(U*, x0, θ) and
        #    ∇_U φ = 0, so d cost*/d(x0, θ) = ∂φ/∂(x0, θ) at fixed U*.
        cbar = cot.cost
        _, phi_vjp = jax.vjp(
            lambda x0_, p_: _reduced_objective(solver, U, x0_, p_), x0, params
        )
        x0_bar_c, p_bar_c = phi_vjp(cbar)

        # 3. implicit term: q = H⁻¹ ū, then pull q back through the mixed
        #    second derivative ∇²_{(x0,θ),U} φ via a VJP of the gradient
        #    function (second-order AD).
        with jax.default_matmul_precision("highest"):
            lin = solver._linearize(
                _feasible_rollout(solver, U, x0, params), U, params
            )
            q = _lqr_hessian_solve(solver, lin, u_total)

            grad_U = jax.grad(
                lambda U_, x0_, p_: _reduced_objective(solver, U_, x0_, p_)
            )
            _, g_vjp = jax.vjp(
                lambda x0_, p_: grad_U(U, x0_, p_), x0, params
            )
            x0_bar_i, p_bar_i = g_vjp(q)

        x0_bar = x0_bar_r + x0_bar_c - x0_bar_i
        p_bar = jax.tree.map(
            lambda a, b, c: a + b - c, p_bar_r, p_bar_c, p_bar_i
        )
        # warm start gets zero cotangent (the converged solution does not
        # depend on it); int/bool leaves take float0 as JAX requires
        import numpy as np

        sol_bar = jax.tree.map(
            lambda a: (
                jnp.zeros_like(a)
                if jnp.issubdtype(a.dtype, jnp.inexact)
                else np.zeros(a.shape, jax.dtypes.float0)
            ),
            sol,
        )
        return (sol_bar, x0_bar, p_bar)

    _solve.defvjp(_fwd, _bwd)
    return _solve


# ---------------------------------------------------------------------------
# unrolled fixed-iteration solve (plain reverse AD)
# ---------------------------------------------------------------------------


def unrolled_solve(solver: MSDDP, n_iters: int, ls_width: int = 4):
    """A `while_loop`-free MS-DDP solve: exactly `n_iters` iterations, each
    trying a width-`ls_width` α fan and keeping the largest accepted step
    (masked no-op when none accepts). Standard `jax.grad` differentiates
    it; each iteration is `jax.checkpoint`ed so the backward pass
    rematerializes instead of storing every iterate.

    Matches `solver.solve` semantics on the accept/reject rule (Armijo on
    the defect-aware merit, msddp._iteration) but with a fixed iteration
    count — the RTI/online regime (max_iters small) where gradients of
    the COMPUTED iterate, not the idealized optimum, are wanted."""
    opts = solver.opts

    def _iteration(state: _IterState, x0, params):
        dtype = state.X.dtype
        with jax.default_matmul_precision("highest"):
            lin = solver._linearize(state.X, state.U, params)
            mu = jnp.asarray(opts.mu0, dtype)
            ks, Ks, dV1, dV2 = solver._backward(lin, mu)

            nu_w = jnp.asarray(opts.defect_weight, dtype)
            D = jnp.sum(lin["d"] * lin["d"])
            merit0 = state.cost + nu_w * D

            alphas = opts.alpha_0 * (
                opts.line_search_decrease_factor
                ** jnp.arange(ls_width, dtype=dtype)
            )

            def trial(a):
                Xn, Un = solver._rollout(
                    x0, state.X, state.U, ks, Ks, lin["d"], params, a
                )
                new_cost = solver.total_cost(Xn, Un, params)
                new_merit = new_cost + nu_w * (1.0 - a) ** 2 * D
                expected = -(a * dV1 + a**2 * dV2) + (
                    2.0 * a - a**2
                ) * nu_w * D
                ok = (
                    (merit0 - new_merit)
                    >= opts.beta * jnp.maximum(expected, 1e-16)
                ) & jnp.isfinite(new_merit)
                return Xn, Un, new_cost, ok

            Xs, Us, costs, oks = jax.vmap(trial)(alphas)
            idx = jnp.argmax(oks)  # first (largest-α) accepted
            any_ok = jnp.any(oks)

            def pick(arr, old):
                new = arr[idx]
                return jnp.where(any_ok, new, old)

            return _IterState(
                X=pick(Xs, state.X),
                U=pick(Us, state.U),
                cost=pick(costs, state.cost),
                converged=state.converged | ~any_ok,
                it=state.it + 1,
            )

    def _solve(sol: DDPSolution, x0, params) -> DDPSolution:
        X_pinned = sol.X.at[0].set(x0)  # node-0 pin (see MSDDP._solve_impl)
        with jax.default_matmul_precision("highest"):
            cost0 = solver.total_cost(X_pinned, sol.U, params)
        state = _IterState(
            X=X_pinned, U=sol.U, cost=cost0,
            converged=jnp.asarray(False), it=jnp.asarray(0, jnp.int32),
        )

        step = jax.checkpoint(lambda s, _: (_iteration(s, x0, params), None))
        state, _ = jax.lax.scan(step, state, None, length=n_iters)

        defects = solver._true_defects(state.X, state.U, params)
        return DDPSolution(
            X=state.X, U=state.U, cost=state.cost,
            converged=state.converged, iterations=state.it,
            defect_norm=jnp.max(jnp.abs(defects)),
        )

    return _solve
