"""Multiple-shooting Gauss-Newton DDP — the TPU-native replacement for the
reference's closed-source C++ `pyddp.DdpSolver` + its Horizon adapter
(reference ddp.py:10-230; option surface ddp.py:14-35; solve contract
ddp.py:96-106: `solve(params) -> (x: nx×(ns+1), u: nu×ns)`, `is_converged`,
`set_initial_state`, `set_x_warmstart`, `set_u_warmstart`).

Capability map:
  - Per-node scalar cost L_n = Σ‖residual‖² + w_c Σ‖eq‖² (ddp.py:179-214,
    constraint_weight=1e6 at ddp.py:181) — here kept in *residual* form so
    the quadratization is exact Gauss-Newton (JᵀJ), not a generic Hessian:
    better conditioned and cheaper than the reference's symbolic second
    derivatives.
  - Terminal cost L_N = Σ‖residual‖² with NO constraint penalty
    (ddp.py:216-226) — reproduced exactly.
  - Discrete dynamics = one explicit Euler step per node (ddp.py:228-230).
  - Multiple shooting: the solver iterates on a state *trajectory* with
    defects d_n = f(x_n,u_n) − x_{n+1}; the forward pass contracts defects
    by (1−α) per accepted step (the standard MS-DDP scheme; the reference
    README's open TODOs "prove MS DDP equations", "defect contraction rate"
    README.md:5-6 identify pyddp as the same family).

TPU-first design (SURVEY.md §7.1, §7.2 layer 5):
  - Derivatives: `jax.jacfwd` of residual/dynamics stacks, `vmap`ed over
    nodes — one fused batched evaluation instead of the reference's O(ns)
    Python loop of CasADi graph builds (ddp.py:83-91).
  - Backward Riccati sweep: `lax.scan` (reverse) over nodes.
  - Armijo backtracking line search: bounded `lax.while_loop` with masked
    updates, so batched problem instances can converge at different
    iterations (SURVEY.md §7.4 item 4).
  - The whole solve is one jittable pure function of
    (x0, params, warm-start) — `vmap` gives the batched scenario axis,
    `shard_map` distributes it over a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.ocp.spec import OCP


class DDPSolution(NamedTuple):
    """Solver state/result — a pytree. X/U persist across `solve` calls so
    each MPC tick warm-starts from the previous plan, matching the stateful
    C++ solver's behavior across ticks (ddp.py:96-106)."""

    X: jnp.ndarray          # (ns+1, nx) state trajectory
    U: jnp.ndarray          # (ns, nu) input trajectory
    cost: jnp.ndarray       # final total cost (scalar)
    converged: jnp.ndarray  # bool — is_converged() (ddp.py:106)
    iterations: jnp.ndarray  # int32 — DDP iterations taken
    defect_norm: jnp.ndarray  # max-norm of multiple-shooting defects


class _IterState(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    cost: jnp.ndarray
    converged: jnp.ndarray
    it: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MSDDP:
    """Multiple-shooting GN-DDP over a fixed OCP. Construct once per problem;
    `solve` is pure/jittable (compile-once, mutate-params — SURVEY.md §3.5)."""

    ocp: OCP
    opts: DDPOptions = DDPOptions()

    # ---------- cost evaluation ----------

    def _stage_rho(self, x, u, p):
        """Stacked stage residual: cost residuals + √w_c · equality
        constraints (the ddp.py:179-214 penalty, in residual form)."""
        r = self.ocp.stage_residual(x, u, p)
        h = self.ocp.stage_eq(x, u, p)
        wc = jnp.sqrt(jnp.asarray(self.opts.constraint_weight, x.dtype))
        return jnp.concatenate([r, wc * h])

    def total_cost(self, X, U, params):
        """Σ_n ‖ρ_n‖² + ‖ρ_N‖² — the objective the line search monitors."""
        ns = self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}
        rho = jax.vmap(self._stage_rho)(X[:ns], U, p_stage)
        p_term = {k: v[ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        return jnp.sum(rho * rho) + jnp.sum(rt * rt)

    # ---------- linearization (vmapped over nodes) ----------

    def _linearize(self, X, U, params):
        ns, nx, nu = self.ocp.ns, self.ocp.nx, self.ocp.nu
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}

        def dyn_xu(xu, p):
            return self.ocp.step(xu[:nx], xu[nx:], p, dt)

        def rho_xu(xu, p):
            return self._stage_rho(xu[:nx], xu[nx:], p)

        XU = jnp.concatenate([X[:ns], U], axis=1)
        # dynamics: f, A=∂f/∂x, B=∂f/∂u
        F = jax.vmap(dyn_xu)(XU, p_stage)                       # (ns, nx)
        Jf = jax.vmap(jax.jacfwd(dyn_xu))(XU, p_stage)          # (ns, nx, nx+nu)
        A, B = Jf[:, :, :nx], Jf[:, :, nx:]
        # stage residuals and Jacobians (exact Gauss-Newton data)
        rho = jax.vmap(rho_xu)(XU, p_stage)                     # (ns, nr)
        Jr = jax.vmap(jax.jacfwd(rho_xu))(XU, p_stage)          # (ns, nr, nx+nu)
        Jx, Ju = Jr[:, :, :nx], Jr[:, :, nx:]

        # terminal
        p_term = {k: v[self.ocp.ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        Jt = jax.jacfwd(self.ocp.terminal_residual)(X[ns], p_term)

        defects = F - X[1:]                                     # (ns, nx)
        return dict(A=A, B=B, Jx=Jx, Ju=Ju, rho=rho, rt=rt, Jt=Jt, d=defects)

    # ---------- backward Riccati sweep (reverse scan) ----------

    def _backward(self, lin, mu):
        nx, nu = self.ocp.nx, self.ocp.nu
        dtype = lin["rho"].dtype

        Vx_T = 2.0 * lin["Jt"].T @ lin["rt"]
        Vxx_T = 2.0 * lin["Jt"].T @ lin["Jt"]

        I_u = jnp.eye(nu, dtype=dtype)

        def node(carry, inp):
            Vx, Vxx, dV1, dV2 = carry
            A, B, Jx, Ju, rho, d = inp
            # cost quadratics (GN)
            lx = 2.0 * Jx.T @ rho
            lu = 2.0 * Ju.T @ rho
            lxx = 2.0 * Jx.T @ Jx
            luu = 2.0 * Ju.T @ Ju
            lux = 2.0 * Ju.T @ Jx
            # defect-aware chain: value gradient evaluated at f(x,u)=x⁺+d
            Vx_d = Vx + Vxx @ d
            Qx = lx + A.T @ Vx_d
            Qu = lu + B.T @ Vx_d
            Qxx = lxx + A.T @ Vxx @ A
            Quu = luu + B.T @ Vxx @ B + mu * I_u
            Qux = lux + B.T @ Vxx @ A
            # gains via Cholesky (Quu is PSD by GN construction + mu)
            chol = jax.scipy.linalg.cho_factor(Quu)
            k = -jax.scipy.linalg.cho_solve(chol, Qu)
            K = -jax.scipy.linalg.cho_solve(chol, Qux)
            # value recursion
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            dV1_new = dV1 + k @ Qu
            dV2_new = dV2 + 0.5 * k @ Quu @ k
            return (Vx_new, Vxx_new, dV1_new, dV2_new), (k, K)

        zero = jnp.zeros((), dtype)
        (_, _, dV1, dV2), (ks, Ks) = jax.lax.scan(
            node,
            (Vx_T, Vxx_T, zero, zero),
            (lin["A"], lin["B"], lin["Jx"], lin["Ju"], lin["rho"], lin["d"]),
            reverse=True,
        )
        return ks, Ks, dV1, dV2

    # ---------- forward pass with defect contraction ----------

    def _rollout(self, x0, X, U, ks, Ks, d, params, alpha):
        dt = self.ocp.dt
        ns = self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}

        def node(xhat, inp):
            Xn, Un, kn, Kn, dn, pn = inp
            u = Un + alpha * kn + Kn @ (xhat - Xn)
            # multiple-shooting defect contraction: leave (1−α) of the gap
            # open so that α→0 recovers the current iterate exactly and α=1
            # yields a dynamically feasible trajectory (d = f(x,u) − x⁺)
            xnext = self.ocp.step(xhat, u, pn, dt) - (1.0 - alpha) * dn
            return xnext, (xhat, u)

        x_final, (Xs, Us) = jax.lax.scan(
            node, x0, (X[:ns], U, ks, Ks, d, p_stage)
        )
        Xnew = jnp.concatenate([Xs, x_final[None]], axis=0)
        return Xnew, Us

    # ---------- one DDP iteration ----------

    def _parallel_line_search(self, state, x0, params, lin, ks, Ks,
                              dV1, dV2, nu, D, merit0):
        """Evaluate all candidate step sizes in one batched rollout and pick
        the largest accepted α — identical accept/reject rule as the
        sequential backtracking loop, but constant latency (no data-dependent
        while_loop, no stragglers across a vmapped batch)."""
        opts = self.opts
        K = opts.parallel_line_search_width
        dtype = state.X.dtype
        alphas = opts.alpha_0 * (
            opts.line_search_decrease_factor ** jnp.arange(K, dtype=dtype)
        )

        def trial(a):
            Xn, Un = self._rollout(
                x0, state.X, state.U, ks, Ks, lin["d"], params, a
            )
            new_cost = self.total_cost(Xn, Un, params)
            new_merit = new_cost + nu * (1.0 - a) ** 2 * D
            expected = -(a * dV1 + a**2 * dV2) + (2.0 * a - a**2) * nu * D
            ok = (
                ((merit0 - new_merit) >= opts.beta * jnp.maximum(expected, 1e-16))
                & jnp.isfinite(new_merit)
                & (a >= opts.alpha_converge_threshold)
            )
            return Xn, Un, new_cost, new_merit, ok

        Xs, Us, costs, merits, oks = jax.vmap(trial)(alphas)
        any_ok = jnp.any(oks)
        # first accepted (largest α): argmax returns the first True
        idx = jnp.argmax(oks)
        return (
            Xs[idx], Us[idx], costs[idx], merits[idx], any_ok
        )

    def _iteration(self, state: _IterState, x0, params):
        opts = self.opts
        lin = self._linearize(state.X, state.U, params)
        mu = jnp.asarray(opts.mu0, state.X.dtype)
        ks, Ks, dV1, dV2 = self._backward(lin, mu)

        # Multiple-shooting merit: φ = J + ν·D with D = Σ‖defect‖². The
        # forward pass contracts every defect by exactly (1−α), so the
        # defect part of the merit after a trial step is (1−α)²·ν·D —
        # analytic, no re-evaluation needed. Without this term the raw-cost
        # Armijo can never leave an infeasible warm start (its J is
        # artificially low because the trajectory ignores the dynamics).
        nu = jnp.asarray(opts.defect_weight, state.X.dtype)
        D = jnp.sum(lin["d"] * lin["d"])
        merit0 = state.cost + nu * D

        if opts.line_search_mode == "parallel":
            Xn, Un, new_cost, new_merit, accepted = self._parallel_line_search(
                state, x0, params, lin, ks, Ks, dV1, dV2, nu, D, merit0
            )
            merit_red = merit0 - new_merit
            converged = (~accepted) | (
                merit_red <= opts.cost_reduction_ths * jnp.maximum(merit0, 1.0)
            )
            return _IterState(
                X=jnp.where(accepted, Xn, state.X),
                U=jnp.where(accepted, Un, state.U),
                cost=jnp.where(accepted, new_cost, state.cost),
                converged=converged,
                it=state.it + 1,
            )

        class LS(NamedTuple):
            alpha: jnp.ndarray
            X: jnp.ndarray
            U: jnp.ndarray
            cost: jnp.ndarray
            merit: jnp.ndarray
            accepted: jnp.ndarray
            steps: jnp.ndarray

        def ls_cond(s: LS):
            return (~s.accepted) & (s.steps < opts.max_line_search_steps) & (
                s.alpha >= opts.alpha_converge_threshold
            )

        def ls_body(s: LS):
            a = s.alpha
            Xn, Un = self._rollout(
                x0, state.X, state.U, ks, Ks, lin["d"], params, a
            )
            new_cost = self.total_cost(Xn, Un, params)
            new_merit = new_cost + nu * (1.0 - a) ** 2 * D
            # expected merit reduction: GN model for J + exact defect part
            expected = -(a * dV1 + a**2 * dV2) + (2.0 * a - a**2) * nu * D
            suff = (merit0 - new_merit) >= opts.beta * jnp.maximum(
                expected, 1e-16
            )
            ok = suff & jnp.isfinite(new_merit)
            return LS(
                alpha=jnp.where(ok, a, a * opts.line_search_decrease_factor),
                X=jnp.where(ok, Xn, s.X),
                U=jnp.where(ok, Un, s.U),
                cost=jnp.where(ok, new_cost, s.cost),
                merit=jnp.where(ok, new_merit, s.merit),
                accepted=ok,
                steps=s.steps + 1,
            )

        init = LS(
            alpha=jnp.asarray(opts.alpha_0, state.X.dtype),
            X=state.X,
            U=state.U,
            cost=state.cost,
            merit=merit0,
            accepted=jnp.asarray(False),
            steps=jnp.asarray(0, jnp.int32),
        )
        ls = jax.lax.while_loop(ls_cond, ls_body, init)

        merit_red = merit0 - ls.merit
        converged = (~ls.accepted) | (
            merit_red <= opts.cost_reduction_ths * jnp.maximum(merit0, 1.0)
        )
        return _IterState(
            X=jnp.where(ls.accepted, ls.X, state.X),
            U=jnp.where(ls.accepted, ls.U, state.U),
            cost=jnp.where(ls.accepted, ls.cost, state.cost),
            converged=converged,
            it=state.it + 1,
        )

    # ---------- public API ----------

    def init(self, x0, U0: Optional[jnp.ndarray] = None) -> DDPSolution:
        """Cold-start state: X = x0 replicated, U = 0 (or given U0) — the
        multiple-shooting initialization (all defects live on the dynamics)."""
        ns = self.ocp.ns
        U = jnp.zeros((ns, self.ocp.nu), x0.dtype) if U0 is None else U0
        X = jnp.tile(x0[None], (ns + 1, 1))
        z = jnp.zeros((), x0.dtype)
        return DDPSolution(
            X=X, U=U, cost=z, converged=jnp.asarray(False),
            iterations=jnp.asarray(0, jnp.int32), defect_norm=z,
        )

    def solve(self, sol: DDPSolution, x0, params) -> DDPSolution:
        """One full MS-DDP solve (ddp.py:96-106). Pure and jittable; vmap
        over a leading batch axis of (sol, x0, params) for scenario sweeps.

        Traced under full-f32 matmul precision: TPU matmuls default to
        bf16 inputs, which has too few mantissa bits for the 1e6-penalty
        Riccati algebra (SURVEY.md §7.4 item 1) — with bf16 the Cholesky
        factors are garbage, every line search fails, and defects never
        close. These are tiny (≤61-wide) matrices; full precision costs
        nothing measurable."""
        with jax.default_matmul_precision("highest"):
            return self._solve_impl(sol, x0, params)

    def _solve_impl(self, sol: DDPSolution, x0, params) -> DDPSolution:
        opts = self.opts
        cost0 = self.total_cost(sol.X, sol.U, params)
        state = _IterState(
            X=sol.X, U=sol.U, cost=cost0,
            converged=jnp.asarray(False), it=jnp.asarray(0, jnp.int32),
        )

        def cond(s: _IterState):
            return (~s.converged) & (s.it < opts.max_iters)

        def body(s: _IterState):
            return self._iteration(s, x0, params)

        final = jax.lax.while_loop(cond, body, state)

        ns = self.ocp.ns
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        F = jax.vmap(lambda x, u, p: self.ocp.step(x, u, p, dt))(
            final.X[:ns], final.U, p_stage
        )
        defect = jnp.max(jnp.abs(F - final.X[1:]))
        return DDPSolution(
            X=final.X, U=final.U, cost=final.cost, converged=final.converged,
            iterations=final.it, defect_norm=defect,
        )

    def solution_dict(self, sol: DDPSolution) -> Dict[str, Any]:
        """Named solution blocks — `getSolutionDict` parity (ddp.py:119-151).
        Arrays are time-major (ns+1, dim) (the reference returns dim×nodes;
        transposed here for TPU-friendly layout)."""
        out: Dict[str, Any] = dict(x_opt=sol.X, u_opt=sol.U)
        out.update(self.ocp.state_layout.unpack(sol.X))
        out.update(self.ocp.input_layout.unpack(sol.U))
        return out
