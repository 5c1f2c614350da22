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

Variable box bounds (`ocp.x_lb/x_ub/u_lb/u_ub` — the reference's
`setBounds` surface, isrbd_example.py:188-221 force boxes / cdot limits,
:425-431 online state pinning) are handled as the special case g(x,u)=x
(resp. u) of the inequality path: per-node one-sided AL residuals with
their own multiplier arrays, no Jacobian cost beyond the identity rows.
Node-indexed bound values flow through the parameter pytree (keys
`al_x_lb` etc.), so they can be re-pinned per tick without recompilation.

Capability parity: this solves exactly the problem class of the isrbd path
— hard equality constraints (contact height, hybrid SRBD/LIP dynamics,
LIP-zone), active inequality constraints (friction cones), variable bounds
(force boxes ±max_contact_force, contact-velocity boxes) — to feasibility
tolerances set by `ALOptions`, warm-startable per MPC tick
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


class PhasePrior(NamedTuple):
    """Gait-phase-indexed AL multiplier priors for periodic serving.

    Under the receding horizon the ONLY multiplier rows that
    `shift_warmstart` cannot align are the freshly injected tail: after
    the roll, stage row ns-1 holds the schedule the WPG wrote at the
    PREVIOUS tick's terminal node, and the terminal multipliers face a
    brand-new terminal write — both start one λ-update behind (the
    round-4 violation floor; BENCH_NOTES.md). The gait schedule is
    periodic (cycle index = step_counter % (2·step_nodes), reference
    wpg.py:71), so the converged tail multiplier for each phase is
    LEARNABLE: these tables hold an EMA of the post-solve tail
    multipliers per cycle phase, and the serving tick seeds the injected
    rows from them instead of repeating the stale row. Pure warm-start
    data — a wrong prior costs iterations, never correctness (the AL
    updates re-center it).

    Shapes (unbatched; serving carries a leading fleet axis):
      lam_tail  (P, n_eq)   prior for stage row ns-1, indexed by the
                            phase of the schedule AT that row
      lam_T     (P, n_eq_T) prior for the terminal multipliers, indexed
                            by the phase of the terminal write
      seen_*    (P,)        entry valid (first visit copies, later
                            visits EMA-blend)
    """

    lam_tail: jnp.ndarray
    lam_T: jnp.ndarray
    seen_tail: jnp.ndarray
    seen_T: jnp.ndarray


class FullPhasePrior(NamedTuple):
    """Per-phase tables of the FULL stage-equality multiplier field.

    Why the tail-only PhasePrior is not enough (round-5 probe,
    tools/diag_cz_nodes.py): under rolling, the multiplier that sits at
    node n entered the horizon at the terminal injection (ns-1-n) ticks
    ago and has received exactly one λ-update per node it traversed —
    so LATE nodes carry 1–5-update-old multipliers, and the steady
    violation floor concentrates there (nodes 11–18), across ALL
    contacts and phases. The gait problem is PERIODIC, so λ*(node,
    phase) is a fixed field: give every (node, phase) pair its own
    table entry and write the post-solve field back each tick — each
    entry then accumulates one λ-update per CYCLE, converging across
    cycles to λ*(·, p) instead of restarting from the tail seed on
    every horizon transit. Pure warm-start data (AL updates re-center
    within a tick after transients); memory is (P, ns, n_eq) per member
    — ~34 KB for the biped serving problem.

    Inequality multipliers (cones/boxes) stay rolled: they are not the
    binding family (same probe) and their tables would be 10× the size.
    """

    lam_eq: jnp.ndarray      # (P, ns, n_eq)
    lam_eq_T: jnp.ndarray    # (P, n_eq_T)
    seen: jnp.ndarray        # (P,) bool


class ALState(NamedTuple):
    sol: DDPSolution
    lam_eq: jnp.ndarray      # (ns, n_eq) stage equality multipliers
    lam_eq_T: jnp.ndarray    # (n_eq_T,) terminal equality multipliers
    mu_ub: jnp.ndarray       # (ns, n_ineq) upper-bound multipliers (≥0)
    mu_lb: jnp.ndarray       # (ns, n_ineq) lower-bound multipliers (≥0)
    mu_x_ub: jnp.ndarray     # (ns+1, nx) state upper-box multipliers (≥0)
    mu_x_lb: jnp.ndarray     # (ns+1, nx) state lower-box multipliers (≥0)
    mu_u_ub: jnp.ndarray     # (ns, nu) input upper-box multipliers (≥0)
    mu_u_lb: jnp.ndarray     # (ns, nu) input lower-box multipliers (≥0)
    rho: jnp.ndarray         # scalar penalty
    viol: jnp.ndarray        # last max constraint violation


def _one_sided(v, lb, ub, mu_lb, mu_ub, rho, sr):
    """AL residual pair for lb ≤ v ≤ ub with ±inf entries masked out."""
    ub_f = jnp.where(jnp.isfinite(ub), ub, 0.0)
    lb_f = jnp.where(jnp.isfinite(lb), lb, 0.0)
    ub_m = jnp.isfinite(ub).astype(v.dtype)
    lb_m = jnp.isfinite(lb).astype(v.dtype)
    t_ub = sr * ub_m * jnp.maximum(0.0, v - ub_f + mu_ub / rho)
    t_lb = sr * lb_m * jnp.maximum(0.0, lb_f - v + mu_lb / rho)
    return t_ub, t_lb


def _bound_violation(v, lb, ub):
    """Elementwise constraint violation of lb ≤ v ≤ ub (0 where satisfied)."""
    over = jnp.where(jnp.isfinite(ub), jnp.maximum(0.0, v - ub), 0.0)
    under = jnp.where(jnp.isfinite(lb), jnp.maximum(0.0, lb - v), 0.0)
    return jnp.maximum(over, under)


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
        has_xb = outer.x_lb is not None or outer.x_ub is not None
        has_ub = outer.u_lb is not None or outer.u_ub is not None
        object.__setattr__(self, "_has_xb", has_xb)
        object.__setattr__(self, "_has_ub", has_ub)

        # Equality stacks in SCALED space (ocp.eq_scale): the entire AL
        # machinery below — residual terms, multipliers, violations, the
        # ρ-growth schedule — sees S·h. See the rationale at
        # ocp/spec.py::OCP.eq_scale.
        if outer.eq_scale is not None:
            sc = jnp.asarray(outer.eq_scale)
            stage_eq = lambda x, u, p: sc * outer.stage_eq(x, u, p)
        else:
            stage_eq = outer.stage_eq
        if outer.eq_scale_T is not None:
            sc_T = jnp.asarray(outer.eq_scale_T)
            terminal_eq = lambda x, p: sc_T * outer.terminal_eq(x, p)
        else:
            terminal_eq = outer.terminal_eq
        object.__setattr__(self, "_stage_eq", stage_eq)
        object.__setattr__(self, "_terminal_eq", terminal_eq)

        # Per-row penalty stiffness ρ_j = ρ·w_j (OCP.eq_rho_weight): the
        # AL term for row j is √(ρw_j)·h_j + λ_j/√(ρw_j) and the update
        # λ_j ← λ_j + ρw_j·h_j. The violation measure stays in eq_scale
        # units (w shapes the SCHEDULE, not the metric).
        w_eq = (jnp.asarray(outer.eq_rho_weight)
                if outer.eq_rho_weight is not None else None)
        w_eq_T = (jnp.asarray(outer.eq_rho_weight_T)
                  if outer.eq_rho_weight_T is not None else None)
        object.__setattr__(self, "_w_eq", w_eq)
        object.__setattr__(self, "_w_eq_T", w_eq_T)
        sqw_eq = jnp.sqrt(w_eq) if w_eq is not None else None
        sqw_eq_T = jnp.sqrt(w_eq_T) if w_eq_T is not None else None

        # normalized (∞-defaulted) bound arrays
        def _norm(b, shape, sign):
            if b is not None:
                return jnp.asarray(b)
            return jnp.full(shape, sign * jnp.inf)

        x_lb = _norm(outer.x_lb, (outer.ns + 1, outer.nx), -1)
        x_ub = _norm(outer.x_ub, (outer.ns + 1, outer.nx), +1)
        u_lb = _norm(outer.u_lb, (outer.ns, outer.nu), -1)
        u_ub = _norm(outer.u_ub, (outer.ns, outer.nu), +1)
        object.__setattr__(self, "_x_lb", x_lb)
        object.__setattr__(self, "_x_ub", x_ub)
        object.__setattr__(self, "_u_lb", u_lb)
        object.__setattr__(self, "_u_ub", u_ub)

        def stage_residual(x, u, p):
            r = outer.stage_residual(x, u, p)
            h = stage_eq(x, u, p)
            rho = p["al_rho"][0]
            sr = jnp.sqrt(rho)
            srw = sr * sqw_eq if sqw_eq is not None else sr
            terms = [r, srw * h + p["al_lam_eq"] / srw]
            if outer.ineq_ub is not None:
                g = outer.stage_ineq(x, u, p)
                t_ub, t_lb = _one_sided(
                    g, outer.ineq_lb, outer.ineq_ub,
                    p["al_mu_lb"], p["al_mu_ub"], rho, sr,
                )
                terms += [t_ub, t_lb]
            if has_xb:
                t_ub, t_lb = _one_sided(
                    x, p["al_x_lb"], p["al_x_ub"],
                    p["al_mu_x_lb"], p["al_mu_x_ub"], rho, sr,
                )
                terms += [t_ub, t_lb]
            if has_ub:
                t_ub, t_lb = _one_sided(
                    u, p["al_u_lb"], p["al_u_ub"],
                    p["al_mu_u_lb"], p["al_mu_u_ub"], rho, sr,
                )
                terms += [t_ub, t_lb]
            return jnp.concatenate(terms)

        def terminal_residual(x, p):
            r = outer.terminal_residual(x, p)
            hT = terminal_eq(x, p)
            rho = p["al_rho"][0]
            sr = jnp.sqrt(rho)
            srw = sr * sqw_eq_T if sqw_eq_T is not None else sr
            terms = [r, srw * hT + p["al_lam_eq_T"] / srw]
            if has_xb:
                t_ub, t_lb = _one_sided(
                    x, p["al_x_lb"], p["al_x_ub"],
                    p["al_mu_x_lb"], p["al_mu_x_ub"], rho, sr,
                )
                terms += [t_ub, t_lb]
            return jnp.concatenate(terms)

        # Inner-stack sparsity metadata. The inner residual stack is
        #   [outer residual; AL-eq; cone ub; cone lb;
        #    x-box ub; x-box lb; u-box ub; u-box lb]
        # Compose its x/u row sets from the outer OCP's declarations so
        # the batched inner solves take the blocksparse backward and the
        # sliced linearizer (the SRBD hot-path machinery) — this is what
        # makes constrained fleet serving fast, not just possible. When
        # the outer OCP declares nothing, the inner OCP must not inherit
        # the outer's (shorter-stack) sets either: clear them.
        #   - outer residual_x/u_rows index the combined
        #     [stage_residual; stage_eq] stack (msddp._stage_rho), which
        #     occupies the same leading rows of the inner stack.
        #   - cone segments use ineq_x/u_rows (None = all rows, both).
        #   - box segments are diagonal: row j is live iff dim j is ever
        #     finitely bounded in the STATIC bounds. Params-delivered
        #     bound overrides (the online re-pinning channel) must keep
        #     that finite-dim pattern or the declared sparsity goes
        #     stale (tests/test_isrbd.py pins the composed sets vs AD).
        inner_x_rows = inner_u_rows = None
        if (
            outer.residual_x_rows is not None
            and outer.residual_u_rows is not None
        ):
            import numpy as np

            zx = jnp.zeros(outer.nx)
            zu = jnp.zeros(outer.nu)
            p0 = {k: v[0] for k, v in outer.params.items()}
            n_r = outer.stage_residual(zx, zu, p0).shape[0]
            n_eq = outer.stage_eq(zx, zu, p0).shape[0]
            xr = [int(r) for r in outer.residual_x_rows]
            ur = [int(r) for r in outer.residual_u_rows]
            off = n_r + n_eq
            if outer.ineq_ub is not None:
                n_in = outer.stage_ineq(zx, zu, p0).shape[0]
                cone_x = (outer.ineq_x_rows
                          if outer.ineq_x_rows is not None else range(n_in))
                cone_u = (outer.ineq_u_rows
                          if outer.ineq_u_rows is not None else range(n_in))
                for seg in (0, 1):                       # t_ub, then t_lb
                    xr.extend(off + seg * n_in + int(r) for r in cone_x)
                    ur.extend(off + seg * n_in + int(r) for r in cone_u)
                off += 2 * n_in
            if has_xb:
                for b in (x_ub, x_lb):                   # ub rows, lb rows
                    live = np.where(np.isfinite(np.asarray(b)).any(0))[0]
                    xr.extend(off + int(j) for j in live)
                    off += outer.nx
            if has_ub:
                for b in (u_ub, u_lb):
                    live = np.where(np.isfinite(np.asarray(b)).any(0))[0]
                    ur.extend(off + int(j) for j in live)
                    off += outer.nu
            if xr and ur:
                inner_x_rows = tuple(sorted(xr))
                inner_u_rows = tuple(sorted(ur))

        inner_ocp = dataclasses.replace(
            outer,
            stage_residual=stage_residual,
            terminal_residual=terminal_residual,
            stage_eq=lambda x, u, p: jnp.zeros((0,), x.dtype),
            terminal_eq=lambda x, p: jnp.zeros((0,), x.dtype),
            residual_x_rows=inner_x_rows,
            residual_u_rows=inner_u_rows,
        )
        # The inner gain solve must be Cholesky here: at ρ→1e8 the AL
        # Quu reaches condition ~1e13 and the block-Schur spd_solve (a
        # TPU-hot-path choice, fine at the 1e6-penalty conditioning of
        # the plain MS-DDP stack) emits NaNs — every line search then
        # rejects on isfinite and warm-started online solves silently
        # no-op (caught by tests/test_isrbd.py::TestISRBDOnline once the
        # x0 pin made the no-op observable).
        inner_opts = dataclasses.replace(self.ddp_opts, quu_solver="cholesky")
        object.__setattr__(self, "_inner", MSDDP(inner_ocp, inner_opts))

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
        ns, nx, nu = self.ocp.ns, self.ocp.nx, self.ocp.nu
        dtype = x0.dtype
        return ALState(
            sol=self._inner.init(x0, U0),
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
        )

    # ---------- constraint evaluation at a trajectory ----------

    def _bounds_from(self, params):
        """Bound-value arrays for this solve: the params pytree can override
        the static OCP bounds (online re-pinning, isrbd_example.py:425-431)."""
        return (
            params.get("x_lb", self._x_lb),
            params.get("x_ub", self._x_ub),
            params.get("u_lb", self._u_lb),
            params.get("u_ub", self._u_ub),
        )

    def _constraints(self, X, U, params):
        ocp = self.ocp
        ns = ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}
        h = jax.vmap(self._stage_eq)(X[:ns], U, p_stage)        # (ns, n_eq)
        p_term = {k: v[ns] for k, v in params.items()}
        hT = self._terminal_eq(X[ns], p_term)
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
        if self._has_xb or self._has_ub:
            x_lb, x_ub, u_lb, u_ub = self._bounds_from(params)
            bviol = jnp.maximum(
                jnp.max(_bound_violation(X, x_lb, x_ub), initial=0.0),
                jnp.max(_bound_violation(U, u_lb, u_ub), initial=0.0),
            )
            viol = jnp.maximum(viol, bviol)
        return h, hT, g, viol

    # ---------- solve ----------

    def _params_with_multipliers(
        self, params, st: ALState
    ) -> Dict[str, jnp.ndarray]:
        ns = self.ocp.ns
        lam_eq = st.lam_eq
        p = dict(params)
        # stage rows 0..ns-1 hold stage multipliers; row ns is unused there
        p["al_lam_eq"] = jnp.concatenate(
            [lam_eq, jnp.zeros((1,) + lam_eq.shape[1:], lam_eq.dtype)]
        )
        p["al_lam_eq_T"] = jnp.tile(st.lam_eq_T[None], (ns + 1, 1))
        p["al_mu_ub"] = jnp.concatenate(
            [st.mu_ub, jnp.zeros((1,) + st.mu_ub.shape[1:], st.mu_ub.dtype)]
        )
        p["al_mu_lb"] = jnp.concatenate(
            [st.mu_lb, jnp.zeros((1,) + st.mu_lb.shape[1:], st.mu_lb.dtype)]
        )
        p["al_rho"] = jnp.full((ns + 1, 1), st.rho, lam_eq.dtype)
        if self._has_xb:
            x_lb, x_ub, _, _ = self._bounds_from(params)
            p["al_x_lb"] = jnp.asarray(x_lb, lam_eq.dtype)
            p["al_x_ub"] = jnp.asarray(x_ub, lam_eq.dtype)
            p["al_mu_x_ub"] = st.mu_x_ub
            p["al_mu_x_lb"] = st.mu_x_lb
        if self._has_ub:
            _, _, u_lb, u_ub = self._bounds_from(params)
            pad = jnp.full((1, self.ocp.nu), jnp.inf, lam_eq.dtype)
            p["al_u_lb"] = jnp.concatenate([jnp.asarray(u_lb, lam_eq.dtype), -pad])
            p["al_u_ub"] = jnp.concatenate([jnp.asarray(u_ub, lam_eq.dtype), pad])
            zrow = jnp.zeros((1, self.ocp.nu), lam_eq.dtype)
            p["al_mu_u_ub"] = jnp.concatenate([st.mu_u_ub, zrow])
            p["al_mu_u_lb"] = jnp.concatenate([st.mu_u_lb, zrow])
        # bound values are delivered via al_* keys; drop any raw overrides so
        # the inner solver's param pytree has a fixed structure
        for k in ("x_lb", "x_ub", "u_lb", "u_ub"):
            p.pop(k, None)
        return p

    def _updated_multipliers(self, st: ALState, X, U, h, hT, g, params, rho):
        """AL multiplier updates (rho may carry leading batch axes)."""
        r2 = rho[..., None] if jnp.ndim(rho) else rho
        r3 = r2[..., None] if jnp.ndim(rho) else rho
        w = self._w_eq if self._w_eq is not None else 1.0
        w_T = self._w_eq_T if self._w_eq_T is not None else 1.0
        lam_eq = st.lam_eq + r3 * w * h
        lam_eq_T = st.lam_eq_T + r2 * w_T * hT
        if self.ocp.ineq_ub is not None:
            ub = jnp.where(jnp.isfinite(self.ocp.ineq_ub), self.ocp.ineq_ub, 0.0)
            lb = jnp.where(jnp.isfinite(self.ocp.ineq_lb), self.ocp.ineq_lb, 0.0)
            ub_mask = jnp.isfinite(self.ocp.ineq_ub)
            lb_mask = jnp.isfinite(self.ocp.ineq_lb)
            mu_ub = jnp.where(
                ub_mask, jnp.maximum(0.0, st.mu_ub + r3 * (g - ub)), 0.0
            )
            mu_lb = jnp.where(
                lb_mask, jnp.maximum(0.0, st.mu_lb + r3 * (lb - g)), 0.0
            )
        else:
            mu_ub, mu_lb = st.mu_ub, st.mu_lb
        mu_x_ub, mu_x_lb = st.mu_x_ub, st.mu_x_lb
        mu_u_ub, mu_u_lb = st.mu_u_ub, st.mu_u_lb
        if self._has_xb or self._has_ub:
            x_lb, x_ub, u_lb, u_ub = self._bounds_from(params)
            if self._has_xb:
                mu_x_ub = jnp.where(
                    jnp.isfinite(x_ub),
                    jnp.maximum(0.0, st.mu_x_ub + r3 * (X - jnp.where(
                        jnp.isfinite(x_ub), x_ub, 0.0))),
                    0.0,
                )
                mu_x_lb = jnp.where(
                    jnp.isfinite(x_lb),
                    jnp.maximum(0.0, st.mu_x_lb + r3 * (jnp.where(
                        jnp.isfinite(x_lb), x_lb, 0.0) - X)),
                    0.0,
                )
            if self._has_ub:
                mu_u_ub = jnp.where(
                    jnp.isfinite(u_ub),
                    jnp.maximum(0.0, st.mu_u_ub + r3 * (U - jnp.where(
                        jnp.isfinite(u_ub), u_ub, 0.0))),
                    0.0,
                )
                mu_u_lb = jnp.where(
                    jnp.isfinite(u_lb),
                    jnp.maximum(0.0, st.mu_u_lb + r3 * (jnp.where(
                        jnp.isfinite(u_lb), u_lb, 0.0) - U)),
                    0.0,
                )
        return lam_eq, lam_eq_T, mu_ub, mu_lb, mu_x_ub, mu_x_lb, mu_u_ub, mu_u_lb

    def solve(self, st: ALState, x0, params) -> ALState:
        """Full AL solve: fixed outer-iteration scan (jittable, vmappable)."""
        opts = self.al_opts

        def outer(st: ALState, _):
            p_in = self._params_with_multipliers(params, st)
            sol = self._inner.solve(st.sol, x0, p_in)
            h, hT, g, viol = self._constraints(sol.X, sol.U, params)
            (lam_eq, lam_eq_T, mu_ub, mu_lb,
             mu_x_ub, mu_x_lb, mu_u_ub, mu_u_lb) = self._updated_multipliers(
                st, sol.X, sol.U, h, hT, g, params, st.rho
            )
            grow = viol > opts.viol_decrease * st.viol
            rho_new = jnp.where(
                grow & (viol > opts.tol),
                jnp.minimum(st.rho * opts.rho_growth, opts.rho_max),
                st.rho,
            )
            return ALState(
                sol=sol, lam_eq=lam_eq, lam_eq_T=lam_eq_T,
                mu_ub=mu_ub, mu_lb=mu_lb,
                mu_x_ub=mu_x_ub, mu_x_lb=mu_x_lb,
                mu_u_ub=mu_u_ub, mu_u_lb=mu_u_lb,
                rho=rho_new, viol=viol,
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
                lambda p, s: self._params_with_multipliers(p, s),
                in_axes=(0, 0),
            )(params, st._replace(sol=st.sol))
            sol = self._inner.solve_batch(st.sol, x0, p_in)
            h, hT, g, viol = jax.vmap(self._constraints)(sol.X, sol.U, params)
            (lam_eq, lam_eq_T, mu_ub, mu_lb,
             mu_x_ub, mu_x_lb, mu_u_ub, mu_u_lb) = self._updated_multipliers(
                st, sol.X, sol.U, h, hT, g, params, st.rho
            )
            grow = viol > opts.viol_decrease * st.viol
            rho_new = jnp.where(
                grow & (viol > opts.tol),
                jnp.minimum(st.rho * opts.rho_growth, opts.rho_max),
                st.rho,
            )
            return ALState(
                sol=sol, lam_eq=lam_eq, lam_eq_T=lam_eq_T,
                mu_ub=mu_ub, mu_lb=mu_lb,
                mu_x_ub=mu_x_ub, mu_x_lb=mu_x_lb,
                mu_u_ub=mu_u_ub, mu_u_lb=mu_u_lb,
                rho=rho_new, viol=viol,
            ), viol

        st_out, _ = jax.lax.scan(outer, st, jnp.arange(opts.outer_iters))
        return st_out

    def solve_online(self, st: ALState, x0, params) -> ALState:
        """One outer iteration with frozen penalty — the warm-started online
        MPC variant (gnsqp max_iterations=1 analog, isrbd_example.py:403)."""
        p_in = self._params_with_multipliers(params, st)
        sol = self._inner.solve(st.sol, x0, p_in)
        h, hT, g, viol = self._constraints(sol.X, sol.U, params)
        w = self._w_eq if self._w_eq is not None else 1.0
        w_T = self._w_eq_T if self._w_eq_T is not None else 1.0
        return st._replace(
            sol=sol,
            lam_eq=st.lam_eq + st.rho * w * h,
            lam_eq_T=st.lam_eq_T + st.rho * w_T * hT,
            viol=viol,
        )

    def shift_warmstart(self, st: ALState) -> ALState:
        """Roll the warm start one node forward (last row repeated) —
        trajectory AND node-indexed AL multipliers — so the online MPC's
        initial iterate and its multiplier estimates line up with the
        receding horizon. Beyond the reference (its warm start reuses the
        unshifted previous solution, isrbd_example.py:423). Note the
        hybrid SRBD/LIP node masks stay put (they are horizon-fixed,
        isrbd_example.py:344-348), so multipliers shifted across the
        model boundary start one update behind — the AL update re-centers
        them within a tick (measured in tools/bench_isrbd.py --shift)."""
        def roll(a):
            return jnp.roll(a, -1, axis=0).at[-1].set(a[-1])

        sol = st.sol._replace(X=roll(st.sol.X), U=roll(st.sol.U))
        return st._replace(
            sol=sol,
            lam_eq=roll(st.lam_eq),
            mu_ub=roll(st.mu_ub), mu_lb=roll(st.mu_lb),
            mu_x_ub=roll(st.mu_x_ub), mu_x_lb=roll(st.mu_x_lb),
            mu_u_ub=roll(st.mu_u_ub), mu_u_lb=roll(st.mu_u_lb),
        )

    # ---------- gait-phase multiplier priors ----------

    def init_phase_prior(self, period: int, dtype=jnp.float32) -> PhasePrior:
        """Empty per-phase tail-multiplier tables (see PhasePrior). For a
        fleet, build per-member tables: vmap over a dummy batch axis (each
        member may sit at a different gait phase)."""
        n_eq, n_eq_T, _ = self._probe_sizes()
        return PhasePrior(
            lam_tail=jnp.zeros((period, n_eq), dtype),
            lam_T=jnp.zeros((period, n_eq_T), dtype),
            seen_tail=jnp.zeros((period,), bool),
            seen_T=jnp.zeros((period,), bool),
        )

    def _seed_from_prior(self, st: ALState, prior: PhasePrior,
                         phase) -> ALState:
        """Replace the injected tail multipliers with the phase table's
        entries (where the phase has been visited). `phase` is the cycle
        index the WPG used for THIS tick's terminal write
        (step_counter % period, read BEFORE advance); the stage tail row
        holds the PREVIOUS tick's terminal write → phase−1."""
        P = prior.lam_tail.shape[0]
        tail_ph = (phase - 1) % P
        lam_tail = jnp.where(
            prior.seen_tail[tail_ph], prior.lam_tail[tail_ph], st.lam_eq[-1]
        )
        lam_T = jnp.where(prior.seen_T[phase], prior.lam_T[phase],
                          st.lam_eq_T)
        return st._replace(
            lam_eq=st.lam_eq.at[-1].set(lam_tail), lam_eq_T=lam_T
        )

    def _update_prior(self, prior: PhasePrior, st: ALState, phase,
                      ema: float) -> PhasePrior:
        """EMA the post-solve tail multipliers into the phase tables
        (first visit copies)."""
        P = prior.lam_tail.shape[0]
        tail_ph = (phase - 1) % P
        new_tail = jnp.where(
            prior.seen_tail[tail_ph],
            (1.0 - ema) * prior.lam_tail[tail_ph] + ema * st.lam_eq[-1],
            st.lam_eq[-1],
        )
        new_T = jnp.where(
            prior.seen_T[phase],
            (1.0 - ema) * prior.lam_T[phase] + ema * st.lam_eq_T,
            st.lam_eq_T,
        )
        return PhasePrior(
            lam_tail=prior.lam_tail.at[tail_ph].set(new_tail),
            lam_T=prior.lam_T.at[phase].set(new_T),
            seen_tail=prior.seen_tail.at[tail_ph].set(True),
            seen_T=prior.seen_T.at[phase].set(True),
        )

    def init_full_phase_prior(self, period: int,
                              dtype=jnp.float32) -> FullPhasePrior:
        """Empty full-field phase tables (see FullPhasePrior). For a
        fleet, vmap over a dummy batch axis."""
        n_eq, n_eq_T, _ = self._probe_sizes()
        return FullPhasePrior(
            lam_eq=jnp.zeros((period, self.ocp.ns, n_eq), dtype),
            lam_eq_T=jnp.zeros((period, n_eq_T), dtype),
            seen=jnp.zeros((period,), bool),
        )

    def _seed_full_prior(self, st: ALState, prior: FullPhasePrior,
                         phase) -> ALState:
        """Replace the whole stage/terminal equality multiplier field
        with the phase-p table entry (once visited; rolled field until
        then). `phase` = the cycle index of THIS tick's WPG terminal
        write."""
        ok = prior.seen[phase]
        return st._replace(
            lam_eq=jnp.where(ok, prior.lam_eq[phase], st.lam_eq),
            lam_eq_T=jnp.where(ok, prior.lam_eq_T[phase], st.lam_eq_T),
        )

    def _update_full_prior(self, prior: FullPhasePrior, st: ALState,
                           phase, ema: float) -> FullPhasePrior:
        new_eq = jnp.where(
            prior.seen[phase],
            (1.0 - ema) * prior.lam_eq[phase] + ema * st.lam_eq,
            st.lam_eq,
        )
        new_T = jnp.where(
            prior.seen[phase],
            (1.0 - ema) * prior.lam_eq_T[phase] + ema * st.lam_eq_T,
            st.lam_eq_T,
        )
        return FullPhasePrior(
            lam_eq=prior.lam_eq.at[phase].set(new_eq),
            lam_eq_T=prior.lam_eq_T.at[phase].set(new_T),
            seen=prior.seen.at[phase].set(True),
        )

    def serving_tick_batch(self, st: ALState, x0, params,
                           outers: int = 2, prior: PhasePrior = None,
                           phase=None, prior_ema: float = 0.5):
        """THE production constrained fleet-serving tick (round-4 config,
        BENCH_NOTES.md): shifted warm start (trajectory + node-indexed
        multipliers roll with the receding horizon) followed by `outers`
        frozen-penalty outer iterations. Two outers with a 1-iteration
        inner budget dominate one deep solve: the second multiplier
        update re-centers the stale λ at the gait schedule's touchdown
        discontinuity (measured 18,174 solve/s at 9.5e-4 scaled
        violation vs 12,827 at 1.5e-3 for one 3-iteration outer, B=256
        TPU v5e). Callers advance the WPG/params first, then pass the
        new x0 (node-1 pin) here.

        With `prior` (+ per-member `phase`, the cycle index of this
        tick's WPG terminal write): seed multipliers from the gait-phase
        tables before solving and EMA the post-solve values back
        afterwards — returns (ALState, prior). A `PhasePrior` seeds only
        the injected tail rows; a `FullPhasePrior` replaces the whole
        equality-multiplier field (the round-5 serving config — each
        (node, phase) entry converges across gait cycles). Without a
        prior, returns the ALState alone (round-4 behavior)."""
        st = jax.vmap(self.shift_warmstart)(st)
        full = isinstance(prior, FullPhasePrior)
        if prior is not None:
            seed = self._seed_full_prior if full else self._seed_from_prior
            st = jax.vmap(seed)(st, prior, phase)
        for _ in range(outers):
            st = self.solve_online_batch(st, x0, params)
        if prior is not None:
            upd = self._update_full_prior if full else self._update_prior
            prior = jax.vmap(upd, in_axes=(0, 0, 0, None))(
                prior, st, phase, prior_ema
            )
            return st, prior
        return st

    def solve_online_batch(self, st: ALState, x0, params) -> ALState:
        """Batched `solve_online`: one frozen-penalty outer iteration over
        a leading scenario axis — a building block of the fleet-serving
        tick (`serving_tick_batch`); inner solves run through the
        lane-major batched MS-DDP path."""
        p_in = jax.vmap(
            lambda p, s: self._params_with_multipliers(p, s),
            in_axes=(0, 0),
        )(params, st)
        sol = self._inner.solve_batch(st.sol, x0, p_in)
        h, hT, g, viol = jax.vmap(self._constraints)(sol.X, sol.U, params)
        r2 = st.rho[:, None]
        w = self._w_eq if self._w_eq is not None else 1.0
        w_T = self._w_eq_T if self._w_eq_T is not None else 1.0
        return st._replace(
            sol=sol,
            lam_eq=st.lam_eq + r2[..., None] * w * h,
            lam_eq_T=st.lam_eq_T + r2 * w_T * hT,
            viol=viol,
        )

    def solution_dict(self, st: ALState):
        return self._inner.solution_dict(st.sol)
