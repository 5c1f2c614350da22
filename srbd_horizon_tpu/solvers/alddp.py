"""AL-DDP — augmented-Lagrangian constrained trajectory optimization, the
TPU-native replacement for the reference's IPOPT / gnsqp solver path
(isrbd_example.py:27,361-369,401-406; Horizon `Solver.make_solver`).

Why not an interior-point port: IPOPT's sparse-LDLᵀ pivoting and fraction-
to-the-boundary line searches are branch-heavy and hostile to XLA. The
augmented-Lagrangian approach (ALTRO-style) keeps the entire solve inside
the already-batched MS-DDP machinery:

  outer loop (fixed count, lax.scan):
    1. inner MS-DDP solve of min J(X,U) + Σ [ λᵀh + ρ/2‖h‖² ]
                                   + Σ ρ/2‖max(0, μ/ρ + g-ub)‖² (+ lb side)
    2. multiplier update  λ ← λ + ρ h,  μ ← max(0, μ + ρ (g-ub))
    3. penalty growth     ρ ← γρ if the constraint violation did not
                          drop by `viol_decrease` (classic AL schedule)

The AL terms are expressed in *residual form* so the inner solver's exact
Gauss-Newton quadratization applies:
    eq:   √ρ·h + λ/√ρ        (‖·‖² = ρ‖h‖² + 2λᵀh + const)
    ineq: √ρ·max(0, g-ub + μ/ρ)   (one-sided; same for lb)

Capability parity: this solves exactly the problem class of the isrbd path
— hard equality constraints (contact height, hybrid SRBD/LIP dynamics,
LIP-zone), active inequality constraints (friction cones, force boxes) —
to feasibility tolerances set by `ALOptions`, warm-startable per MPC tick
(mat_storer.setInitialGuess analog, isrbd_example.py:423). A "gnsqp online"
analog is one outer iteration with frozen multipliers
(isrbd_example.py:403 max_iterations=1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.ocp.spec import OCP
from srbd_horizon_tpu.solvers.msddp import DDPSolution, MSDDP


@dataclasses.dataclass(frozen=True)
class ALOptions:
    outer_iters: int = 8
    rho0: float = 1e2
    rho_growth: float = 10.0
    rho_max: float = 1e8
    viol_decrease: float = 0.25    # required violation contraction per outer
    tol: float = 1e-6              # target max constraint violation


class ALState(NamedTuple):
    sol: DDPSolution
    lam_eq: jnp.ndarray      # (ns, n_eq) stage equality multipliers
    lam_eq_T: jnp.ndarray    # (n_eq_T,) terminal equality multipliers
    mu_ub: jnp.ndarray       # (ns, n_ineq) upper-bound multipliers (≥0)
    mu_lb: jnp.ndarray       # (ns, n_ineq) lower-bound multipliers (≥0)
    rho: jnp.ndarray         # scalar penalty
    viol: jnp.ndarray        # last max constraint violation


@dataclasses.dataclass(frozen=True)
class ALDDP:
    ocp: OCP
    ddp_opts: DDPOptions = DDPOptions()
    al_opts: ALOptions = ALOptions()

    def __post_init__(self):
        # Build the inner OCP: AL terms folded into the residual stack,
        # multipliers/penalty delivered through the parameter pytree (the
        # same compile-once/mutate-params channel as everything else).
        outer = self.ocp

        def stage_residual(x, u, p):
            r = outer.stage_residual(x, u, p)
            h = outer.stage_eq(x, u, p)
            sr = jnp.sqrt(p["al_rho"][0])
            terms = [r, sr * h + p["al_lam_eq"] / sr]
            if outer.ineq_ub is not None:
                g = outer.stage_ineq(x, u, p)
                ub = jnp.where(jnp.isfinite(outer.ineq_ub), outer.ineq_ub, 0.0)
                lb = jnp.where(jnp.isfinite(outer.ineq_lb), outer.ineq_lb, 0.0)
                ub_mask = jnp.isfinite(outer.ineq_ub).astype(x.dtype)
                lb_mask = jnp.isfinite(outer.ineq_lb).astype(x.dtype)
                terms.append(
                    sr * ub_mask * jnp.maximum(0.0, g - ub + p["al_mu_ub"] / p["al_rho"][0])
                )
                terms.append(
                    sr * lb_mask * jnp.maximum(0.0, lb - g + p["al_mu_lb"] / p["al_rho"][0])
                )
            return jnp.concatenate(terms)

        def terminal_residual(x, p):
            r = outer.terminal_residual(x, p)
            hT = outer.terminal_eq(x, p)
            sr = jnp.sqrt(p["al_rho"][0])
            return jnp.concatenate([r, sr * hT + p["al_lam_eq_T"] / sr])

        inner_ocp = dataclasses.replace(
            outer,
            stage_residual=stage_residual,
            terminal_residual=terminal_residual,
            stage_eq=lambda x, u, p: jnp.zeros((0,), x.dtype),
            terminal_eq=lambda x, p: jnp.zeros((0,), x.dtype),
        )
        object.__setattr__(self, "_inner", MSDDP(inner_ocp, self.ddp_opts))

    # ---------- sizes ----------

    def _probe_sizes(self):
        ocp = self.ocp
        x = jnp.zeros(ocp.nx)
        u = jnp.zeros(ocp.nu)
        p = {k: v[0] for k, v in ocp.params.items()}
        n_eq = ocp.stage_eq(x, u, p).shape[0]
        n_eq_T = ocp.terminal_eq(x, p).shape[0]
        n_in = ocp.stage_ineq(x, u, p).shape[0] if ocp.ineq_ub is not None else 0
        return n_eq, n_eq_T, n_in

    def init(self, x0, U0=None) -> ALState:
        n_eq, n_eq_T, n_in = self._probe_sizes()
        ns = self.ocp.ns
        dtype = x0.dtype
        return ALState(
            sol=self._inner.init(x0, U0),
            lam_eq=jnp.zeros((ns, n_eq), dtype),
            lam_eq_T=jnp.zeros((n_eq_T,), dtype),
            mu_ub=jnp.zeros((ns, n_in), dtype),
            mu_lb=jnp.zeros((ns, n_in), dtype),
            rho=jnp.asarray(self.al_opts.rho0, dtype),
            viol=jnp.asarray(jnp.inf, dtype),
        )

    # ---------- constraint evaluation at a trajectory ----------

    def _constraints(self, X, U, params):
        ocp = self.ocp
        ns = ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}
        h = jax.vmap(ocp.stage_eq)(X[:ns], U, p_stage)          # (ns, n_eq)
        p_term = {k: v[ns] for k, v in params.items()}
        hT = ocp.terminal_eq(X[ns], p_term)
        if ocp.ineq_ub is not None:
            g = jax.vmap(ocp.stage_ineq)(X[:ns], U, p_stage)    # (ns, n_in)
            ub_v = jnp.where(
                jnp.isfinite(ocp.ineq_ub), jnp.maximum(0.0, g - ocp.ineq_ub), 0.0
            )
            lb_v = jnp.where(
                jnp.isfinite(ocp.ineq_lb), jnp.maximum(0.0, ocp.ineq_lb - g), 0.0
            )
        else:
            g = jnp.zeros((ns, 0), X.dtype)
            ub_v = lb_v = g
        viol = jnp.maximum(
            jnp.max(jnp.abs(h), initial=0.0),
            jnp.maximum(
                jnp.max(jnp.abs(hT), initial=0.0),
                jnp.maximum(
                    jnp.max(ub_v, initial=0.0), jnp.max(lb_v, initial=0.0)
                ),
            ),
        )
        return h, hT, g, viol

    # ---------- solve ----------

    def _params_with_multipliers(
        self, params, lam_eq, lam_eq_T, mu_ub, mu_lb, rho
    ) -> Dict[str, jnp.ndarray]:
        ns = self.ocp.ns
        p = dict(params)
        # stage rows 0..ns-1 hold stage multipliers; row ns is unused there
        p["al_lam_eq"] = jnp.concatenate(
            [lam_eq, jnp.zeros((1,) + lam_eq.shape[1:], lam_eq.dtype)]
        )
        p["al_lam_eq_T"] = jnp.tile(lam_eq_T[None], (ns + 1, 1))
        p["al_mu_ub"] = jnp.concatenate(
            [mu_ub, jnp.zeros((1,) + mu_ub.shape[1:], mu_ub.dtype)]
        )
        p["al_mu_lb"] = jnp.concatenate(
            [mu_lb, jnp.zeros((1,) + mu_lb.shape[1:], mu_lb.dtype)]
        )
        p["al_rho"] = jnp.full((ns + 1, 1), rho, lam_eq.dtype)
        return p

    def _with_multipliers(self, params, st: ALState) -> Dict[str, jnp.ndarray]:
        return self._params_with_multipliers(
            params, st.lam_eq, st.lam_eq_T, st.mu_ub, st.mu_lb, st.rho
        )

    def solve(self, st: ALState, x0, params) -> ALState:
        """Full AL solve: fixed outer-iteration scan (jittable, vmappable)."""
        opts = self.al_opts

        def outer(st: ALState, _):
            p_in = self._with_multipliers(params, st)
            sol = self._inner.solve(st.sol, x0, p_in)
            h, hT, g, viol = self._constraints(sol.X, sol.U, params)
            rho = st.rho
            lam_eq = st.lam_eq + rho * h
            lam_eq_T = st.lam_eq_T + rho * hT
            if self.ocp.ineq_ub is not None:
                ub = jnp.where(jnp.isfinite(self.ocp.ineq_ub), self.ocp.ineq_ub, 0.0)
                lb = jnp.where(jnp.isfinite(self.ocp.ineq_lb), self.ocp.ineq_lb, 0.0)
                ub_mask = jnp.isfinite(self.ocp.ineq_ub)
                lb_mask = jnp.isfinite(self.ocp.ineq_lb)
                mu_ub = jnp.where(
                    ub_mask, jnp.maximum(0.0, st.mu_ub + rho * (g - ub)), 0.0
                )
                mu_lb = jnp.where(
                    lb_mask, jnp.maximum(0.0, st.mu_lb + rho * (lb - g)), 0.0
                )
            else:
                mu_ub, mu_lb = st.mu_ub, st.mu_lb
            grow = viol > opts.viol_decrease * st.viol
            rho_new = jnp.where(
                grow & (viol > opts.tol),
                jnp.minimum(rho * opts.rho_growth, opts.rho_max),
                rho,
            )
            return ALState(
                sol=sol, lam_eq=lam_eq, lam_eq_T=lam_eq_T,
                mu_ub=mu_ub, mu_lb=mu_lb, rho=rho_new, viol=viol,
            ), viol

        st_out, viols = jax.lax.scan(
            outer, st, jnp.arange(opts.outer_iters)
        )
        return st_out

    def solve_batch(self, st: ALState, x0, params) -> ALState:
        """Batched AL solve over a leading scenario axis: inner solves run
        through the lane-major batched MS-DDP path (solve_batch);
        multiplier updates are elementwise and batch transparently."""
        opts = self.al_opts

        def outer(st: ALState, _):
            p_in = jax.vmap(
                lambda p, l, lT, ub_, lb_, r: self._params_with_multipliers(
                    p, l, lT, ub_, lb_, r
                )
            )(params, st.lam_eq, st.lam_eq_T, st.mu_ub, st.mu_lb, st.rho)
            sol = self._inner.solve_batch(st.sol, x0, p_in)
            h, hT, g, viol = jax.vmap(self._constraints)(sol.X, sol.U, params)
            rho = st.rho[..., None, None]
            lam_eq = st.lam_eq + rho * h
            lam_eq_T = st.lam_eq_T + st.rho[..., None] * hT
            if self.ocp.ineq_ub is not None:
                ub = jnp.where(jnp.isfinite(self.ocp.ineq_ub), self.ocp.ineq_ub, 0.0)
                lb = jnp.where(jnp.isfinite(self.ocp.ineq_lb), self.ocp.ineq_lb, 0.0)
                ub_mask = jnp.isfinite(self.ocp.ineq_ub)
                lb_mask = jnp.isfinite(self.ocp.ineq_lb)
                mu_ub = jnp.where(
                    ub_mask, jnp.maximum(0.0, st.mu_ub + rho * (g - ub)), 0.0
                )
                mu_lb = jnp.where(
                    lb_mask, jnp.maximum(0.0, st.mu_lb + rho * (lb - g)), 0.0
                )
            else:
                mu_ub, mu_lb = st.mu_ub, st.mu_lb
            grow = viol > opts.viol_decrease * st.viol
            rho_new = jnp.where(
                grow & (viol > opts.tol),
                jnp.minimum(st.rho * opts.rho_growth, opts.rho_max),
                st.rho,
            )
            return ALState(
                sol=sol, lam_eq=lam_eq, lam_eq_T=lam_eq_T,
                mu_ub=mu_ub, mu_lb=mu_lb, rho=rho_new, viol=viol,
            ), viol

        st_out, _ = jax.lax.scan(outer, st, jnp.arange(opts.outer_iters))
        return st_out

    def solve_online(self, st: ALState, x0, params) -> ALState:
        """One outer iteration with frozen penalty — the warm-started online
        MPC variant (gnsqp max_iterations=1 analog, isrbd_example.py:403)."""
        p_in = self._with_multipliers(params, st)
        sol = self._inner.solve(st.sol, x0, p_in)
        h, hT, g, viol = self._constraints(sol.X, sol.U, params)
        return st._replace(
            sol=sol,
            lam_eq=st.lam_eq + st.rho * h,
            lam_eq_T=st.lam_eq_T + st.rho * hT,
            viol=viol,
        )

    def solution_dict(self, st: ALState):
        return self._inner.solution_dict(st.sol)
