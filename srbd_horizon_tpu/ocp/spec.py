"""The OCP container — TPU-native replacement for Horizon's
`problem.Problem` + variable/function containers (reference prb.py:21 and
the Horizon framework, SURVEY.md §2.2 X6).

Design stance (SURVEY.md §7.1): instead of a symbolic graph compiled into
per-node CasADi functions, an OCP here is a handful of *plain jittable
functions* plus static metadata. Derivatives come from JAX AD inside the
solver; per-node variation flows through a node-indexed parameter pytree
(the reference's compile-once / mutate-params contract, SURVEY.md §3.5).

Contract:
  - `params` is a dict name -> (ns+1, dim) array. The solver slices row n
    and passes the resulting dict `p` to every stage callable. Node masks
    for cost terms are themselves parameter rows (0/1), so "which nodes a
    term is active on" (Horizon's `nodes=` argument, prb.py:184-204) is
    data, not control flow — XLA-friendly and mutable per tick.
  - `stage_residual(x, u, p)` returns the stacked cost-residual vector for
    one interior node; total stage cost is its squared norm (the reference
    builds L_n as Σ sumsqr(residual) — ddp.py:183-189).
  - `terminal_residual(x, p)` likewise for node ns (ddp.py:216-226; note
    the reference's terminal cost contains NO constraint penalty).
  - `stage_eq(x, u, p)` / `terminal_eq(x, p)` are equality-constraint
    stacks (ddp.py:42-48 partition). MS-DDP penalizes them
    (ddp.py:190-196); GN-SQP enforces them.
  - `stage_ineq(x, u, p)` returns g(x,u,p) with static bounds
    (ineq_lb, ineq_ub) — friction cones etc. (isrbd_example.py:312-318).
  - `x_lb/x_ub` ((ns+1, nx)) and `u_lb/u_ub` ((ns, nu)) are node-indexed
    variable box bounds, ±inf-defaulted — the reference's
    `setBounds`/`setInitialGuess` surface (isrbd_example.py:188-221 node-0
    pinning and force boxes, :425-431 online re-pinning, cdot bounds).
    MS-DDP's structural x0 handling covers node-0 state pinning (the
    rollout always starts at x0); the box-bound fields cover everything
    else (force boxes, contact-velocity limits) and are enforced by the
    AL solver (solvers/alddp.py) as one-sided augmented-Lagrangian terms.
  - `step(x, u, p, dt)` is the discrete dynamics for one node
    (ddp.py:228-230 Euler; RK2 for the NLP path prb.py:113).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from srbd_horizon_tpu.ocp.layout import VarLayout


def _zero_vec(x, *_args) -> jnp.ndarray:
    # follow the state dtype: a bare zeros((0,)) is float64 under jax
    # x64 and silently promotes every stack it is concatenated into
    return jnp.zeros((0,), jnp.asarray(x).dtype)


@dataclasses.dataclass(frozen=True)
class OCP:
    """A discrete-time optimal control problem over ns+1 nodes."""

    ns: int
    dt: float
    state_layout: VarLayout
    input_layout: VarLayout

    # dynamics: discrete step x_{n+1} = step(x_n, u_n, p_n, dt)
    step: Callable[..., jnp.ndarray]
    # continuous dynamics (for simulation / alternative integrators)
    xdot: Callable[..., jnp.ndarray]

    # cost residual stacks
    stage_residual: Callable[..., jnp.ndarray]
    terminal_residual: Callable[..., jnp.ndarray]

    # constraint stacks
    stage_eq: Callable[..., jnp.ndarray] = _zero_vec
    terminal_eq: Callable[..., jnp.ndarray] = _zero_vec
    stage_ineq: Callable[..., jnp.ndarray] = _zero_vec
    ineq_lb: Optional[jnp.ndarray] = None
    ineq_ub: Optional[jnp.ndarray] = None

    # Optional per-row equality-constraint scaling, (n_eq,) / (n_eq_T,).
    # The constraint stacks of a whole-body OCP mix units — Newton–Euler
    # rows are in newtons (O(m·g) ≈ 400) while contact-height rows are in
    # meters (O(1e-2)) — so one penalty ρ is simultaneously ~1e5× too
    # stiff for the force rows and too soft for the geometric rows. The
    # AL solver (solvers/alddp.py) works on the SCALED stack S·h:
    # residuals, multipliers, violations, and the ρ-growth schedule all
    # live in scaled (comparable-unit) space. This is what lets the AL
    # path run in float32 on TPU: the unscaled stack needs ρ→1e8 (Quu
    # condition ~1e13, f64-only) where the scaled stack converges at
    # ρ≤1e5. (The reference inherits the same role from IPOPT's internal
    # NLP scaling.) None = unscaled (all ones).
    eq_scale: Optional[jnp.ndarray] = None
    eq_scale_T: Optional[jnp.ndarray] = None

    # Optional per-row AL penalty STIFFNESS multipliers over the (scaled)
    # equality stacks: the AL solver uses ρ_j = ρ·w_j for row j (penalty
    # terms and multiplier updates; the violation measure stays in
    # eq_scale units). Orthogonal to eq_scale: eq_scale normalizes UNITS
    # so one ρ is meaningful across rows; eq_rho_weight sets how hard
    # each row is driven. The physics: a row's per-update violation
    # contraction is ρ_j/(ρ_j+K_j) where K_j is the cost curvature
    # resisting it — geometric rows whose correction rides the dt²/2
    # integrator gain have K ≈ (2/dt²)² ≈ 6.4e5, so at the f32-safe
    # shared ρ=1e5 they contract only ~14%/update and a shifting MPC
    # schedule never converges their multipliers. STATE-ONLY rows can
    # take w ≈ 100-1000 safely: their penalty enters Quu only through
    # BᵀVxxB ≈ (dt²/2)²·ρ_j (harmless), unlike input-touching rows whose
    # w lands directly in Quu (f32-bounded, keep w ≲ 10). Upper bound:
    # the online inner solve must still track ρ_j·h updates per tick or
    # the multipliers overshoot and wind up (measured divergent at
    # w=900 on the isrbd cz rows). None = all ones.
    eq_rho_weight: Optional[jnp.ndarray] = None
    eq_rho_weight_T: Optional[jnp.ndarray] = None

    # node-indexed variable box bounds (isrbd_example.py:188-221,425-431):
    # x bounds are (ns+1, nx), u bounds (ns, nu); None = unbounded.
    x_lb: Optional[jnp.ndarray] = None
    x_ub: Optional[jnp.ndarray] = None
    u_lb: Optional[jnp.ndarray] = None
    u_ub: Optional[jnp.ndarray] = None

    # Optional closed-form stage linearization fast path:
    #   stage_jacobians(x, u, p, dt) ->
    #       (A (nx,nx), B (nx,nu),          discrete-step Jacobians
    #        Jr_x (nr,nx), Jr_u (nr,nu),    stage_residual Jacobians
    #        Jh_x (nh,nx), Jh_u (nh,nu))    stage_eq Jacobians
    # When provided, the DDP solver uses it instead of jacfwd over the
    # stage callables (the reference gets the same effect from CasADi's
    # symbolic jacobians, prb.py via pyddp). Must match AD to rounding —
    # tests/test_analytic_jac.py enforces this.
    stage_jacobians: Optional[Callable[..., Any]] = None

    # Optional residual-sparsity metadata over the STACKED stage rows
    # [stage_residual; stage_eq] (the solver's penalty stack): indices of
    # rows whose Jacobian has any x- (resp. u-) dependence. When set, the
    # lane-major backward computes the Gauss-Newton Gram products over the
    # pruned row sets only (rows absent from a set have identically-zero
    # Jacobian there and contribute nothing). For the SRBD stack this cuts
    # the Gram FLOPs ~65%: 34 of 73 rows touch x, 42 touch u, and only the
    # 3 angular-acceleration rows touch both. tests/test_analytic_jac.py
    # verifies the declared sets are complete against AD.
    residual_x_rows: Optional[Any] = None
    residual_u_rows: Optional[Any] = None

    # Optional inequality-stack sparsity: indices of stage_ineq rows with
    # any x- (resp. u-) dependence. Consumed by the AL solver when it
    # composes sparsity metadata for its inner (AL-folded) residual stack
    # (solvers/alddp.py) — friction-cone rows, for example, depend only
    # on the force inputs. None = assume every ineq row touches both.
    ineq_x_rows: Optional[Any] = None
    ineq_u_rows: Optional[Any] = None

    # Optional dynamics-sparsity metadata: indices of rows where (A − I)
    # (resp. B) of the DISCRETE step Jacobian can be nonzero. Integrator
    # chains (position ← velocity ← input) make most rows of an Euler A
    # exactly identity — for SRBD only 22 of 37 rows of A−I and 18 of 37
    # rows of B are live. The lane-major backward's "blocksparse" mode
    # contracts the Riccati chain over these row slices only (the rows
    # form contiguous runs, so this is static slicing, not gathers),
    # cutting the dominant nx³ terms ~1.7×. Completeness is enforced
    # against AD by tests/test_analytic_jac.py.
    dynamics_x_rows: Optional[Any] = None
    dynamics_u_rows: Optional[Any] = None

    # Optional dynamics COLUMN sparsity: indices of input entries that the
    # discrete step actually consumes (columns of B that can be nonzero).
    # In the isrbd formulation the contact forces are pure *cost/constraint*
    # variables — accelerations drive the double-integrator dynamics and
    # forces appear only in the Newton–Euler / cone residual rows
    # (isrbd_example.py:109-135) — so 12 of 30 B columns are identically
    # zero. The sliced linearizer emits only the live columns and the
    # blocksparse backward contracts BᵀVB / BᵀVA / BᵀVx over them,
    # scattering the results back into the full (nu, ·) Q-terms (the
    # residual Grams still couple every input, so Quu itself stays dense).
    # None = every column live. Completeness enforced against AD by
    # tests/test_analytic_jac.py.
    dynamics_u_cols: Optional[Any] = None

    # template parameter pytree: dict name -> (ns+1, dim) array
    params: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    # model constants closed over by the callables (exposed for telemetry)
    constants: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def nx(self) -> int:
        return self.state_layout.total

    @property
    def nu(self) -> int:
        return self.input_layout.total

    def params_at(self, params: Dict[str, jnp.ndarray], n) -> Dict[str, jnp.ndarray]:
        """Row n of every parameter array (the per-node dict the stage
        callables receive)."""
        return {k: v[n] for k, v in params.items()}

    def stage_cost(self, x, u, p, penalty_weight: float = 0.0) -> jnp.ndarray:
        """L_n = ‖r‖² (+ w ‖h‖² when penalizing equalities) — ddp.py:179-214."""
        r = self.stage_residual(x, u, p)
        cost = jnp.sum(r * r)
        if penalty_weight:
            h = self.stage_eq(x, u, p)
            cost = cost + penalty_weight * jnp.sum(h * h)
        return cost

    def terminal_cost(self, x, p) -> jnp.ndarray:
        """L_N = ‖r_term‖² — ddp.py:216-226 (no constraint penalty)."""
        r = self.terminal_residual(x, p)
        return jnp.sum(r * r)


def unbounded(nodes: int, dim: int, dtype=jnp.float32):
    """(±inf) box-bound pair of shape (nodes, dim) — the ∞-default canvas
    for `x_lb/x_ub`/`u_lb/u_ub`; set finite entries with `.at[...].set`."""
    lb = jnp.full((nodes, dim), -jnp.inf, dtype)
    ub = jnp.full((nodes, dim), jnp.inf, dtype)
    return lb, ub


def node_mask(ns: int, start: int, stop: int, dtype=jnp.float32) -> jnp.ndarray:
    """(ns+1,) 0/1 mask for Horizon-style `nodes=range(start, stop)`
    activation sets (e.g. prb.py:184 `nodes=range(1, ns+1)`)."""
    idx = jnp.arange(ns + 1)
    return ((idx >= start) & (idx < stop)).astype(dtype)
