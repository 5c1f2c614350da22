"""Randomized-OCP fuzz: solver correctness beyond the LIP/SRBD families.

Two properties, each over a family of seeded random OCPs:

1. **Optimum parity vs the independent oracle** — MS-DDP on a random
   smooth nonlinear OCP converges to the same trajectory as the plain
   NumPy single-shooting iLQR (tests/oracle_ddp.py::solve_ilqr, finite
   differences, no shared code). This generalizes the golden-parity tests
   (test_golden_parity.py) from the two hand-built problem families to
   arbitrary residual stacks / dynamics, exercising the solver the way a
   *user-defined* OCP would (the reference accepts arbitrary Horizon
   problems the same way, ddp.py:10-35).

2. **Sparsity-machinery exactness on random structures** — random
   dead-row/dead-column patterns in the dynamics and random residual row
   splits, declared via the OCP sparsity metadata, must reproduce the
   dense path's batched solve across the formation variants
   (linearize_sliced / fused-backward / lane-out). The isrbd problem pins
   ONE such pattern; this fuzzes block offsets and run shapes the
   hand-built problems never hit.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle_ddp import solve_ilqr
from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP, node_mask
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _random_spec(seed):
    """Draw a random smooth OCP: xdot = nl·tanh(Wx x) + Wu u + b, Euler
    step, residuals [wn(n)·Dx(x − xref(n)); Du u; c·sin(x₀)]. Row/column
    masks on Wx/Wu create random dynamics sparsity patterns; all constants
    are shared verbatim between the JAX OCP and the NumPy oracle twin."""
    rng = np.random.RandomState(seed)
    nx = rng.randint(3, 7)
    nu = rng.randint(1, min(nx, 4))
    ns = rng.randint(5, 13)
    dt = 0.05 + 0.05 * rng.rand()

    Wx = rng.randn(nx, nx) / np.sqrt(nx)
    Wu = rng.randn(nx, nu) / np.sqrt(nu)
    # random dead structure: ~1/3 of Wx rows (x-independent xdot rows),
    # ~1/3 of Wu rows (u-independent rows); with nu ≥ 2, one dead u column
    dead_x_rows = rng.rand(nx) < 0.33
    dead_u_rows = rng.rand(nx) < 0.33
    if dead_u_rows.all():
        dead_u_rows[rng.randint(nx)] = False
    Wx[dead_x_rows] = 0.0
    Wu[dead_u_rows] = 0.0
    dead_u_col = rng.randint(nu) if nu >= 2 else None
    if dead_u_col is not None:
        Wu[:, dead_u_col] = 0.0
    nl = 0.4
    b = 0.2 * rng.randn(nx)

    Dx = np.diag(0.3 + 1.7 * rng.rand(nx))
    Du = np.diag(0.05 + 0.3 * rng.rand(nu))
    c_nl = 0.3
    Dt = np.diag(0.5 + 1.5 * rng.rand(nx))
    xref = 0.5 * rng.randn(ns + 1, nx)
    wn = 0.5 + rng.rand(ns + 1)  # node-varying stage weight (params path)
    x0 = 0.8 * rng.randn(nx)

    return dict(
        nx=nx, nu=nu, ns=ns, dt=dt, Wx=Wx, Wu=Wu, nl=nl, b=b,
        Dx=Dx, Du=Du, c_nl=c_nl, Dt=Dt, xref=xref, wn=wn, x0=x0,
        dead_x_rows=dead_x_rows, dead_u_rows=dead_u_rows,
        dead_u_col=dead_u_col,
    )


class _OracleTwin:
    """spec → the plain-NumPy problem interface solve_ilqr consumes."""

    def __init__(self, s):
        self.s = s
        self.ns, self.nx, self.nu = s["ns"], s["nx"], s["nu"]

    def step(self, x, u):
        s = self.s
        xdot = s["nl"] * np.tanh(s["Wx"] @ x) + s["Wu"] @ u + s["b"]
        return x + s["dt"] * xdot

    def residuals(self, x, u, n):
        s = self.s
        return np.concatenate([
            s["wn"][n] * (s["Dx"] @ (x - s["xref"][n])),
            s["Du"] @ u,
            [s["c_nl"] * np.sin(x[0])],
        ])

    def terminal_residuals(self, x):
        s = self.s
        return self.s["Dt"] @ (x - s["xref"][self.ns])


def _build_ocp(s, declare_sparsity=False):
    nx, nu, ns = s["nx"], s["nu"], s["ns"]
    Wx = jnp.asarray(s["Wx"])
    Wu = jnp.asarray(s["Wu"])
    b = jnp.asarray(s["b"])
    Dx = jnp.asarray(s["Dx"])
    Du = jnp.asarray(s["Du"])
    Dt = jnp.asarray(s["Dt"])
    nl, c_nl = s["nl"], s["c_nl"]

    def xdot(x, u, p):
        del p
        return nl * jnp.tanh(Wx @ x) + Wu @ u + b

    def step(x, u, p, dt_):
        return x + dt_ * xdot(x, u, p)

    def stage_residual(x, u, p):
        return jnp.concatenate([
            p["wn"] * (Dx @ (x - p["xref"])),
            Du @ u,
            (c_nl * jnp.sin(x[0]))[None],
        ])

    def terminal_residual(x, p):
        return Dt @ (x - p["xref"])

    kw = {}
    if declare_sparsity:
        # A−I rows live where xdot depends on x (nonzero Wx rows); B rows
        # where it depends on u; B columns excluding the dead input
        dyn_x = tuple(int(i) for i in np.where(~s["dead_x_rows"])[0])
        dyn_u = tuple(int(i) for i in np.where(~s["dead_u_rows"])[0])
        u_cols = tuple(
            c for c in range(nu) if c != s["dead_u_col"]
        )
        nr = nx + nu + 1
        kw = dict(
            dynamics_x_rows=dyn_x,
            dynamics_u_rows=dyn_u,
            dynamics_u_cols=u_cols,
            # residual rows: x-block + the sin row touch x; u-block only u
            residual_x_rows=tuple(range(nx)) + (nr - 1,),
            residual_u_rows=tuple(range(nx, nx + nu)),
        )

    return OCP(
        ns=ns, dt=float(s["dt"]),
        state_layout=VarLayout([("x", nx)]),
        input_layout=VarLayout([("u", nu)]),
        step=step, xdot=xdot,
        stage_residual=stage_residual, terminal_residual=terminal_residual,
        params={
            "xref": jnp.asarray(s["xref"]),
            "wn": jnp.asarray(s["wn"][:, None]),
        },
        **kw,
    )


class TestFuzzOracleParity:
    def test_random_ocps_match_oracle(self):
        for seed in (0, 1, 2, 3):
            s = _random_spec(seed)
            twin = _OracleTwin(s)
            Xo, Uo, cost_o = solve_ilqr(twin, s["x0"].copy(), iters=150)

            ocp = _build_ocp(s)
            solver = MSDDP(ocp, DDPOptions(
                max_iters=150, alpha_converge_threshold=1e-12,
                beta=1e-4, cost_reduction_ths=1e-12, mu0=1e-6,
            ))
            x0 = jnp.asarray(s["x0"])
            sol = solver.solve(solver.init(x0), x0, ocp.params)

            cost_j = float(sol.cost)
            assert np.isfinite(cost_j), f"seed {seed}"
            np.testing.assert_allclose(
                cost_j, cost_o, rtol=1e-6,
                err_msg=f"seed {seed}: converged cost mismatch",
            )
            np.testing.assert_allclose(
                np.asarray(sol.X), Xo, atol=1e-4, rtol=1e-4,
                err_msg=f"seed {seed}: trajectory mismatch vs oracle",
            )
            np.testing.assert_allclose(
                np.asarray(sol.U), Uo, atol=1e-4, rtol=1e-4,
                err_msg=f"seed {seed}: input mismatch vs oracle",
            )


class TestFuzzSparsityExactness:
    def test_random_sparsity_patterns_match_dense(self):
        B = 3
        for seed in (10, 11, 12, 13, 14):
            s = _random_spec(seed)
            x0 = jnp.asarray(s["x0"])[None] + 0.1 * jnp.asarray(
                np.random.RandomState(seed + 100).randn(B, s["nx"])
            )
            params = jax.tree.map(
                lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
                _build_ocp(s).params,
            )
            opts = dict(
                max_iters=8, alpha_converge_threshold=1e-12, beta=1e-4,
            )

            def run(ocp, **overrides):
                sv = MSDDP(ocp, DDPOptions(**{**opts, **overrides}))
                sols = jax.vmap(sv.init)(x0)
                return sv.solve_batch(sols, x0, params)

            dense = run(
                _build_ocp(s, declare_sparsity=False),
                linearize_sliced=False, backward_contract="combined",
            )
            sparse_ocp = _build_ocp(s, declare_sparsity=True)
            for overrides in (
                dict(linearize_sliced=True,
                     backward_contract="blocksparse"),
                dict(linearize_sliced=True,
                     backward_contract="blocksparse",
                     linearize_fused_backward=True),
                dict(linearize_sliced=True,
                     backward_contract="blocksparse",
                     linearize_lane_out=True),
            ):
                got = run(sparse_ocp, **overrides)
                np.testing.assert_allclose(
                    np.asarray(got.X), np.asarray(dense.X),
                    rtol=1e-9, atol=1e-11,
                    err_msg=f"seed {seed} {overrides}",
                )
                np.testing.assert_allclose(
                    np.asarray(got.U), np.asarray(dense.U),
                    rtol=1e-9, atol=1e-11,
                    err_msg=f"seed {seed} {overrides}",
                )


class TestFuzzConstrainedAL:
    """Property fuzz for the AL stack + automatic scaling: random
    constrained OCPs with badly mixed units, CONSTRUCTED FEASIBLE by
    anchoring the equality rows at a drawn trajectory point, must solve
    through auto_eq_scale + ALDDP in float32 to tight scaled violation.
    This exercises the full custom-problem path (docs/CUSTOM_PROBLEMS.md)
    the way a user would hit it: arbitrary residuals, linear mixed-unit
    equalities, input boxes — no hand-built eq_scale/eq_rho_weight."""

    def _random_constrained_ocp(self, seed):
        rng = np.random.default_rng(seed)
        nx = int(rng.integers(2, 5))
        nu = int(rng.integers(1, 4))
        ns = int(rng.integers(6, 12))
        dt = 0.1
        # all constants f32: f64 numpy arrays are strong types under
        # the suite's x64 config and would silently promote the stacks
        f32 = np.float32
        A = (0.3 * rng.standard_normal((nx, nx))).astype(f32)
        Bm = rng.standard_normal((nx, nu)).astype(f32)
        x_ref = rng.standard_normal(nx).astype(f32)

        def xdot(x, u, p):
            del p
            return A @ jnp.tanh(x) + Bm @ u

        def step(x, u, p, dt_):
            return x + dt_ * xdot(x, u, p)

        Wr = rng.uniform(0.3, 3.0, nx).astype(f32)
        Wu = rng.uniform(0.01, 0.1, nu).astype(f32)

        def stage_residual(x, u, p):
            del p
            return jnp.concatenate([Wr * (x - x_ref), Wu * u])

        def terminal_residual(x, p):
            del p
            return Wr * (x - x_ref)

        # mixed-unit LINEAR equality rows anchored at a feasible point:
        # h(x, u) = S_bad @ (C [x;u] - C [x*;u*]) with row magnitudes
        # spanning 1e-2..1e3 (the "newtons next to meters" scenario).
        # n_eq <= nu (pointwise satisfiable via the input) and active on
        # nodes >= 2 only (the isrbd lipzone-mask pattern: with x0
        # pinned, node-0/1 rows can be structurally infeasible)
        n_eq = int(rng.integers(1, min(nu, 2) + 1))
        C = rng.standard_normal((n_eq, nx + nu)).astype(f32)
        S_bad = (10.0 ** rng.uniform(-2, 3, n_eq)).astype(f32)
        x_star = (x_ref + 0.1 * rng.standard_normal(nx)).astype(f32)
        u_star = (0.1 * rng.standard_normal(nu)).astype(f32)
        b = (C @ np.concatenate([x_star, u_star])).astype(f32)

        def stage_eq(x, u, p):
            return p["mask_eq"] * jnp.asarray(S_bad) * (
                jnp.asarray(C) @ jnp.concatenate([x, u]) - jnp.asarray(b)
            )

        from srbd_horizon_tpu.ocp.spec import unbounded

        # finite input box wide enough not to conflict with the random
        # equality subspace (a tight box + eq + dynamics is generically
        # INFEASIBLE; the box path is exercised, it must not bind)
        u_lb, u_ub = unbounded(ns, nu, jnp.float32)
        u_lb = u_lb.at[:].set(jnp.asarray(u_star - 30.0, jnp.float32))
        u_ub = u_ub.at[:].set(jnp.asarray(u_star + 30.0, jnp.float32))

        ocp = OCP(
            ns=ns, dt=dt,
            state_layout=VarLayout([("x", nx)]),
            input_layout=VarLayout([("u", nu)]),
            step=step, xdot=xdot,
            stage_residual=stage_residual,
            terminal_residual=terminal_residual,
            stage_eq=stage_eq,
            u_lb=u_lb, u_ub=u_ub,
            params={"mask_eq": node_mask(ns, 2, ns + 1, jnp.float32)[:, None]},
        )
        x0 = jnp.asarray(x_star + 0.2 * rng.standard_normal(nx),
                         jnp.float32)
        return ocp, x0, np.asarray(S_bad)

    def test_random_mixed_unit_problems_solve_f32(self):
        from srbd_horizon_tpu.ocp.scaling import auto_eq_scale
        from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions

        solved = 0
        for seed in range(6):
            ocp, x0, S_bad = self._random_constrained_ocp(seed)
            scaled = auto_eq_scale(ocp, x0, state_row_stiffness=100.0)
            # the auto scales must have tamed the 1e-2..1e3 row spread
            s = np.asarray(scaled.eq_scale)
            assert np.all(s <= 1.0) and np.all(s > 0.0)
            solver = ALDDP(
                scaled,
                ddp_opts=DDPOptions(
                    max_iters=20, alpha_converge_threshold=1e-12,
                    beta=1e-3, cost_reduction_ths=1e-10,
                ),
                al_opts=ALOptions(outer_iters=8, rho0=1e3, rho_max=1e5,
                                  tol=1e-6),
            )
            st = jax.jit(solver.solve)(solver.init(x0), x0, scaled.params)
            assert bool(jnp.all(jnp.isfinite(st.sol.X))), seed
            assert float(st.viol) < 5e-3, (seed, float(st.viol))
            solved += 1
        assert solved == 6
