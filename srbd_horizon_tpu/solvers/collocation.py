"""Transcribed full-space NLP solver — the `transcription_method` surface
of the reference (Horizon `Transcriptor.make_method('multiple_shooting' |
'direct_collocation')`, reference prb.py:111-113, isrbd_example.py:131-138)
with the IPOPT-role solve done TPU-natively.

Unlike MS-DDP (solvers/msddp.py), which eliminates the dynamics by
rollout, this solver keeps the WHOLE trajectory z = (X, U) as the decision
vector and imposes the dynamics as equality constraints — exactly what a
Horizon Transcriptor emits into the NLP:

  multiple_shooting:   h_n = step(x_n, u_n) − x_{n+1}          (one
      integrator step per interval; reference default, launch:19)
  direct_collocation:  h_n = x_{n+1} − x_n − dt/2·(f(x_n,u_n) +
      f(x_{n+1},u_n))   (trapezoidal/Hermite-Simpson-1 collocation with
      piecewise-constant control; the named alternative, prb.py:112)

Solve strategy (same AL machinery as solvers/alddp.py, different inner
solver): augmented-Lagrangian outer loop over all constraints (dynamics
defects, x₀ pinning, stage/terminal equalities, inequalities, variable
box bounds), with a damped Gauss-Newton inner loop on the stacked
residual vector over the FULL decision vector:

    (JᵀJ + μI) δz = −Jᵀr,   Armijo backtracking on ‖r‖².

The normal-equations matrix is a single dense (nz × nz) SPD solve —
nz ≈ 10³ for these problems, i.e. one well-shaped MXU matmul per
iteration rather than IPOPT's sparse-LDLᵀ pivoting (which is hostile to
XLA). Everything is jittable and vmappable over a scenario batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.ocp.spec import OCP
from srbd_horizon_tpu.solvers.alddp import ALOptions, _one_sided, _bound_violation


@dataclasses.dataclass(frozen=True)
class GNOptions:
    """Inner Gauss-Newton options (the IPOPT iteration-budget analog,
    launch:20 max_iteration)."""

    max_iters: int = 30
    mu: float = 1e-8               # Levenberg damping on JᵀJ
    max_line_search_steps: int = 20
    alpha_decrease: float = 0.5
    beta: float = 1e-4             # Armijo sufficient decrease
    tol_step: float = 1e-10        # stop when ‖δz‖∞ below


class NLPState(NamedTuple):
    z: jnp.ndarray           # (nz,) stacked decision vector (X then U)
    lam_dyn: jnp.ndarray     # (ns, nx) dynamics-defect multipliers
    lam_x0: jnp.ndarray      # (nx,) initial-condition multipliers
    lam_eq: jnp.ndarray      # (ns, n_eq)
    lam_eq_T: jnp.ndarray    # (n_eq_T,)
    mu_ub: jnp.ndarray       # (ns, n_in)
    mu_lb: jnp.ndarray       # (ns, n_in)
    mu_x_ub: jnp.ndarray     # (ns+1, nx)
    mu_x_lb: jnp.ndarray     # (ns+1, nx)
    mu_u_ub: jnp.ndarray     # (ns, nu)
    mu_u_lb: jnp.ndarray     # (ns, nu)
    rho: jnp.ndarray         # scalar AL penalty
    viol: jnp.ndarray        # last max constraint violation
    cost: jnp.ndarray        # last objective (Σ‖cost residuals‖²)


@dataclasses.dataclass(frozen=True)
class TranscribedNLP:
    """Full-space trajectory NLP over an OCP with a selectable
    transcription (the reference's `transcription_method` parameter)."""

    ocp: OCP
    transcription: str = "multiple_shooting"
    gn_opts: GNOptions = GNOptions()
    al_opts: ALOptions = ALOptions()

    def __post_init__(self):
        if self.transcription not in ("multiple_shooting", "direct_collocation"):
            raise ValueError(f"unknown transcription {self.transcription!r}")
        # Equality stacks in SCALED space (OCP.eq_scale — same rationale
        # and semantics as solvers/alddp.py): multipliers, violations,
        # and the ρ schedule all see S·h.
        ocp = self.ocp
        if ocp.eq_scale is not None:
            sc = jnp.asarray(ocp.eq_scale)
            stage_eq = lambda x, u, p: sc * ocp.stage_eq(x, u, p)
        else:
            stage_eq = ocp.stage_eq
        if ocp.eq_scale_T is not None:
            sc_T = jnp.asarray(ocp.eq_scale_T)
            terminal_eq = lambda x, p: sc_T * ocp.terminal_eq(x, p)
        else:
            terminal_eq = ocp.terminal_eq
        object.__setattr__(self, "_stage_eq", stage_eq)
        object.__setattr__(self, "_terminal_eq", terminal_eq)

    # ---------- packing ----------

    @property
    def nz(self) -> int:
        ocp = self.ocp
        return (ocp.ns + 1) * ocp.nx + ocp.ns * ocp.nu

    def pack(self, X, U):
        return jnp.concatenate([X.reshape(-1), U.reshape(-1)])

    def unpack(self, z):
        ocp = self.ocp
        nX = (ocp.ns + 1) * ocp.nx
        X = z[:nX].reshape(ocp.ns + 1, ocp.nx)
        U = z[nX:].reshape(ocp.ns, ocp.nu)
        return X, U

    # ---------- transcription defects ----------

    def _defects(self, X, U, params):
        """(ns, nx) dynamics equality constraints per interval."""
        ocp = self.ocp
        ns, dt = ocp.ns, ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        if self.transcription == "multiple_shooting":
            F = jax.vmap(lambda x, u, p: ocp.step(x, u, p, dt))(
                X[:ns], U, p_stage
            )
            return F - X[1:]
        # trapezoidal collocation, piecewise-constant control on the
        # interval (prb.py:112 'direct_collocation')
        f_lo = jax.vmap(ocp.xdot)(X[:ns], U, p_stage)
        f_hi = jax.vmap(ocp.xdot)(X[1:], U, p_stage)
        return X[1:] - X[:ns] - 0.5 * dt * (f_lo + f_hi)

    # ---------- constraint evaluation (for AL updates / violation) ----

    def _constraints(self, X, U, x0, params):
        ocp = self.ocp
        ns = ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}
        p_term = {k: v[ns] for k, v in params.items()}
        h_dyn = self._defects(X, U, params)
        h_x0 = X[0] - x0
        h_eq = jax.vmap(self._stage_eq)(X[:ns], U, p_stage)
        h_eq_T = self._terminal_eq(X[ns], p_term)
        if ocp.ineq_ub is not None:
            g = jax.vmap(ocp.stage_ineq)(X[:ns], U, p_stage)
        else:
            g = jnp.zeros((ns, 0), X.dtype)
        viol = jnp.max(jnp.abs(h_dyn), initial=0.0)
        viol = jnp.maximum(viol, jnp.max(jnp.abs(h_x0), initial=0.0))
        viol = jnp.maximum(viol, jnp.max(jnp.abs(h_eq), initial=0.0))
        viol = jnp.maximum(viol, jnp.max(jnp.abs(h_eq_T), initial=0.0))
        if ocp.ineq_ub is not None:
            over = jnp.where(
                jnp.isfinite(ocp.ineq_ub), jnp.maximum(0.0, g - ocp.ineq_ub), 0.0
            )
            under = jnp.where(
                jnp.isfinite(ocp.ineq_lb), jnp.maximum(0.0, ocp.ineq_lb - g), 0.0
            )
            viol = jnp.maximum(viol, jnp.max(over, initial=0.0))
            viol = jnp.maximum(viol, jnp.max(under, initial=0.0))
        if ocp.x_ub is not None or ocp.x_lb is not None:
            viol = jnp.maximum(viol, jnp.max(
                _bound_violation(
                    X,
                    ocp.x_lb if ocp.x_lb is not None else -jnp.inf,
                    ocp.x_ub if ocp.x_ub is not None else jnp.inf,
                ), initial=0.0,
            ))
        if ocp.u_ub is not None or ocp.u_lb is not None:
            viol = jnp.maximum(viol, jnp.max(
                _bound_violation(
                    U,
                    ocp.u_lb if ocp.u_lb is not None else -jnp.inf,
                    ocp.u_ub if ocp.u_ub is not None else jnp.inf,
                ), initial=0.0,
            ))
        return h_dyn, h_x0, h_eq, h_eq_T, g, viol

    # ---------- AL residual stack over the decision vector ----------

    def _al_residual(self, z, x0, params, st: NLPState):
        """Stacked residual r(z): cost residuals + √ρ-weighted AL terms
        for every constraint family; ‖r‖² is the AL merit the inner GN
        minimizes (residual form, exact Gauss-Newton — alddp.py docstring)."""
        ocp = self.ocp
        ns = ocp.ns
        X, U = self.unpack(z)
        p_stage = {k: v[:ns] for k, v in params.items()}
        p_term = {k: v[ns] for k, v in params.items()}
        rho = st.rho
        sr = jnp.sqrt(rho)

        r_stage = jax.vmap(ocp.stage_residual)(X[:ns], U, p_stage)
        r_term = ocp.terminal_residual(X[ns], p_term)

        h_dyn = self._defects(X, U, params)
        h_x0 = X[0] - x0
        h_eq = jax.vmap(self._stage_eq)(X[:ns], U, p_stage)
        h_eq_T = self._terminal_eq(X[ns], p_term)

        parts = [
            r_stage.reshape(-1),
            r_term,
            (sr * h_dyn + st.lam_dyn / sr).reshape(-1),
            sr * h_x0 + st.lam_x0 / sr,
            (sr * h_eq + st.lam_eq / sr).reshape(-1),
            sr * h_eq_T + st.lam_eq_T / sr,
        ]
        if ocp.ineq_ub is not None:
            g = jax.vmap(ocp.stage_ineq)(X[:ns], U, p_stage)
            t_ub, t_lb = _one_sided(
                g, ocp.ineq_lb, ocp.ineq_ub, st.mu_lb, st.mu_ub, rho, sr
            )
            parts += [t_ub.reshape(-1), t_lb.reshape(-1)]
        if ocp.x_ub is not None or ocp.x_lb is not None:
            x_lb = ocp.x_lb if ocp.x_lb is not None else jnp.full_like(X, -jnp.inf)
            x_ub = ocp.x_ub if ocp.x_ub is not None else jnp.full_like(X, jnp.inf)
            t_ub, t_lb = _one_sided(
                X, x_lb, x_ub, st.mu_x_lb, st.mu_x_ub, rho, sr
            )
            parts += [t_ub.reshape(-1), t_lb.reshape(-1)]
        if ocp.u_ub is not None or ocp.u_lb is not None:
            u_lb = ocp.u_lb if ocp.u_lb is not None else jnp.full_like(U, -jnp.inf)
            u_ub = ocp.u_ub if ocp.u_ub is not None else jnp.full_like(U, jnp.inf)
            t_ub, t_lb = _one_sided(
                U, u_lb, u_ub, st.mu_u_lb, st.mu_u_ub, rho, sr
            )
            parts += [t_ub.reshape(-1), t_lb.reshape(-1)]
        return jnp.concatenate(parts)

    # ---------- inner damped Gauss-Newton ----------

    def _gn_solve(self, z0, x0, params, st: NLPState):
        opts = self.gn_opts
        dtype = z0.dtype

        def merit(z):
            r = self._al_residual(z, x0, params, st)
            return jnp.sum(r * r)

        def iteration(carry):
            z, m, it, done = carry
            r = self._al_residual(z, x0, params, st)
            J = jax.jacfwd(
                lambda zz: self._al_residual(zz, x0, params, st)
            )(z)                                        # (m, nz)
            g = J.T @ r                                  # (nz,)
            H = J.T @ J + opts.mu * jnp.eye(self.nz, dtype=dtype)
            chol = jax.scipy.linalg.cho_factor(H)
            dz = -jax.scipy.linalg.cho_solve(chol, g)

            # Armijo backtracking on ‖r‖² along dz
            def ls_cond(s):
                alpha, ok, steps = s
                return (~ok) & (steps < opts.max_line_search_steps)

            def ls_body(s):
                alpha, ok, steps = s
                m_new = merit(z + alpha * dz)
                suff = m_new <= m + opts.beta * alpha * 2.0 * (g @ dz)
                ok_new = suff & jnp.isfinite(m_new)
                return (
                    jnp.where(ok_new, alpha, alpha * opts.alpha_decrease),
                    ok_new,
                    steps + 1,
                )

            alpha, ok, _ = jax.lax.while_loop(
                ls_cond, ls_body,
                (jnp.asarray(1.0, dtype), jnp.asarray(False),
                 jnp.asarray(0, jnp.int32)),
            )
            z_new = jnp.where(ok, z + alpha * dz, z)
            m_new = jnp.where(ok, merit(z_new), m)
            small = jnp.max(jnp.abs(alpha * dz)) < opts.tol_step
            return (z_new, m_new, it + 1, (~ok) | small)

        def cond(carry):
            _, _, it, done = carry
            return (~done) & (it < opts.max_iters)

        z_fin, m_fin, it_fin, _ = jax.lax.while_loop(
            cond, iteration,
            (z0, merit(z0), jnp.asarray(0, jnp.int32), jnp.asarray(False)),
        )
        return z_fin, m_fin, it_fin

    # ---------- public API ----------

    def init(self, x0, U0=None) -> NLPState:
        ocp = self.ocp
        ns, nx, nu = ocp.ns, ocp.nx, ocp.nu
        dtype = x0.dtype
        U = jnp.zeros((ns, nu), dtype) if U0 is None else U0
        X = jnp.tile(x0[None], (ns + 1, 1))
        n_eq, n_eq_T, n_in = self._probe_sizes()
        z = jnp.zeros((), dtype)
        return NLPState(
            z=self.pack(X, U),
            lam_dyn=jnp.zeros((ns, nx), dtype),
            lam_x0=jnp.zeros((nx,), dtype),
            lam_eq=jnp.zeros((ns, n_eq), dtype),
            lam_eq_T=jnp.zeros((n_eq_T,), dtype),
            mu_ub=jnp.zeros((ns, n_in), dtype),
            mu_lb=jnp.zeros((ns, n_in), dtype),
            mu_x_ub=jnp.zeros((ns + 1, nx), dtype),
            mu_x_lb=jnp.zeros((ns + 1, nx), dtype),
            mu_u_ub=jnp.zeros((ns, nu), dtype),
            mu_u_lb=jnp.zeros((ns, nu), dtype),
            rho=jnp.asarray(self.al_opts.rho0, dtype),
            viol=jnp.asarray(jnp.inf, dtype),
            cost=z,
        )

    def _probe_sizes(self):
        ocp = self.ocp
        x = jnp.zeros(ocp.nx)
        u = jnp.zeros(ocp.nu)
        p = {k: v[0] for k, v in ocp.params.items()}
        n_eq = ocp.stage_eq(x, u, p).shape[0]
        n_eq_T = ocp.terminal_eq(x, p).shape[0]
        n_in = ocp.stage_ineq(x, u, p).shape[0] if ocp.ineq_ub is not None else 0
        return n_eq, n_eq_T, n_in

    def objective(self, z, params):
        ocp = self.ocp
        ns = ocp.ns
        X, U = self.unpack(z)
        p_stage = {k: v[:ns] for k, v in params.items()}
        p_term = {k: v[ns] for k, v in params.items()}
        r = jax.vmap(ocp.stage_residual)(X[:ns], U, p_stage)
        rt = ocp.terminal_residual(X[ns], p_term)
        return jnp.sum(r * r) + jnp.sum(rt * rt)

    def solve(self, st: NLPState, x0, params) -> NLPState:
        """Full AL-GN solve (jittable, vmappable): fixed outer scan with
        multiplier updates + penalty growth (alddp.py schedule)."""
        opts = self.al_opts

        def outer(st: NLPState, _):
            with jax.default_matmul_precision("highest"):
                z, m, _ = self._gn_solve(st.z, x0, params, st)
            X, U = self.unpack(z)
            h_dyn, h_x0, h_eq, h_eq_T, g, viol = self._constraints(
                X, U, x0, params
            )
            rho = st.rho
            lam_dyn = st.lam_dyn + rho * h_dyn
            lam_x0 = st.lam_x0 + rho * h_x0
            lam_eq = st.lam_eq + rho * h_eq
            lam_eq_T = st.lam_eq_T + rho * h_eq_T
            ocp = self.ocp
            mu_ub, mu_lb = st.mu_ub, st.mu_lb
            if ocp.ineq_ub is not None:
                ub = jnp.where(jnp.isfinite(ocp.ineq_ub), ocp.ineq_ub, 0.0)
                lb = jnp.where(jnp.isfinite(ocp.ineq_lb), ocp.ineq_lb, 0.0)
                mu_ub = jnp.where(
                    jnp.isfinite(ocp.ineq_ub),
                    jnp.maximum(0.0, st.mu_ub + rho * (g - ub)), 0.0,
                )
                mu_lb = jnp.where(
                    jnp.isfinite(ocp.ineq_lb),
                    jnp.maximum(0.0, st.mu_lb + rho * (lb - g)), 0.0,
                )

            def upd_box(mu_hi, mu_lo, v, lb, ub):
                if lb is None and ub is None:
                    return mu_hi, mu_lo
                lb = lb if lb is not None else jnp.full_like(v, -jnp.inf)
                ub = ub if ub is not None else jnp.full_like(v, jnp.inf)
                hi = jnp.where(
                    jnp.isfinite(ub),
                    jnp.maximum(0.0, mu_hi + rho * (
                        v - jnp.where(jnp.isfinite(ub), ub, 0.0))),
                    0.0,
                )
                lo = jnp.where(
                    jnp.isfinite(lb),
                    jnp.maximum(0.0, mu_lo + rho * (
                        jnp.where(jnp.isfinite(lb), lb, 0.0) - v)),
                    0.0,
                )
                return hi, lo

            mu_x_ub, mu_x_lb = upd_box(
                st.mu_x_ub, st.mu_x_lb, X, ocp.x_lb, ocp.x_ub
            )
            mu_u_ub, mu_u_lb = upd_box(
                st.mu_u_ub, st.mu_u_lb, U, ocp.u_lb, ocp.u_ub
            )

            grow = viol > opts.viol_decrease * st.viol
            rho_new = jnp.where(
                grow & (viol > opts.tol),
                jnp.minimum(rho * opts.rho_growth, opts.rho_max),
                rho,
            )
            return NLPState(
                z=z, lam_dyn=lam_dyn, lam_x0=lam_x0,
                lam_eq=lam_eq, lam_eq_T=lam_eq_T,
                mu_ub=mu_ub, mu_lb=mu_lb,
                mu_x_ub=mu_x_ub, mu_x_lb=mu_x_lb,
                mu_u_ub=mu_u_ub, mu_u_lb=mu_u_lb,
                rho=rho_new, viol=viol,
                cost=self.objective(z, params),
            ), viol

        st_out, _ = jax.lax.scan(outer, st, jnp.arange(opts.outer_iters))
        return st_out

    def solution_dict(self, st: NLPState) -> Dict[str, jnp.ndarray]:
        X, U = self.unpack(st.z)
        out = dict(x_opt=X, u_opt=U)
        out.update(self.ocp.state_layout.unpack(X))
        out.update(self.ocp.input_layout.unpack(U))
        return out
