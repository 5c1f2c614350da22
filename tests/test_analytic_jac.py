"""Analytic stage Jacobians vs AD (jacfwd) — the closed-form fast path
(problems/srbd.py stage_jacobians, reference derivatives role:
prb.py:97-109,184-204 via CasADi/pyddp) must match AD to rounding on
randomized states, inputs, and parameter rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _random_xup(ocp, key, dtype):
    kx, ku, kp = jax.random.split(key, 3)
    x = jnp.asarray(
        np.concatenate(
            [
                np.random.RandomState(0).uniform(-0.5, 0.5, 3) + [0, 0, 0.9],
                [0.1, -0.2, 0.05, 0.97],  # deliberately non-unit quat
                np.random.RandomState(1).uniform(-0.3, 0.3, ocp.nx - 7),
            ]
        ),
        dtype,
    ) + 0.01 * jax.random.normal(kx, (ocp.nx,), dtype)
    u = 0.3 * jax.random.normal(ku, (ocp.nu,), dtype)
    p = {k: v[3] + 0.1 * jnp.abs(jax.random.normal(kp, v[3].shape, dtype))
         for k, v in ocp.params.items()}
    # binary-ish switch rows exercise the fswitch/cdotxy coefficients
    p["cdot_switch"] = jnp.round(jnp.clip(p["cdot_switch"], 0, 1))
    return x, u, p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stage_jacobians_match_ad(seed):
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet(), dtype=jnp.float64)
    ocp = prob.ocp
    assert ocp.stage_jacobians is not None
    x, u, p = _random_xup(ocp, jax.random.key(seed), jnp.float64)
    dt = ocp.dt

    A, B, Jrx, Jru, Jhx, Jhu = ocp.stage_jacobians(x, u, p, dt)

    A_ad = jax.jacfwd(lambda x_: ocp.step(x_, u, p, dt))(x)
    B_ad = jax.jacfwd(lambda u_: ocp.step(x, u_, p, dt))(u)
    Jrx_ad = jax.jacfwd(lambda x_: ocp.stage_residual(x_, u, p))(x)
    Jru_ad = jax.jacfwd(lambda u_: ocp.stage_residual(x, u_, p))(u)
    Jhx_ad = jax.jacfwd(lambda x_: ocp.stage_eq(x_, u, p))(x)
    Jhu_ad = jax.jacfwd(lambda u_: ocp.stage_eq(x, u_, p))(u)

    for name, got, want in [
        ("A", A, A_ad), ("B", B, B_ad),
        ("Jrx", Jrx, Jrx_ad), ("Jru", Jru, Jru_ad),
        ("Jhx", Jhx, Jhx_ad), ("Jhu", Jhu, Jhu_ad),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11,
            err_msg=name,
        )


def test_residual_row_sparsity_metadata_complete():
    """Every stacked row NOT in residual_x_rows (resp. u_rows) must have an
    identically-zero Jacobian w.r.t. x (resp. u) — the pruned-Gram backward
    relies on it."""
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet(), dtype=jnp.float64)
    ocp = prob.ocp
    solver = MSDDP(ocp, DDPOptions())
    for seed in range(3):
        x, u, p = _random_xup(ocp, jax.random.key(10 + seed), jnp.float64)
        Jx = np.asarray(jax.jacfwd(lambda x_: solver._stage_rho(x_, u, p))(x))
        Ju = np.asarray(jax.jacfwd(lambda u_: solver._stage_rho(x, u_, p))(u))
        nr = Jx.shape[0]
        not_x = sorted(set(range(nr)) - set(ocp.residual_x_rows))
        not_u = sorted(set(range(nr)) - set(ocp.residual_u_rows))
        assert np.all(Jx[not_x] == 0.0)
        assert np.all(Ju[not_u] == 0.0)


def test_dynamics_row_sparsity_metadata_complete():
    """Rows NOT in dynamics_x_rows must be exactly identity rows of A
    (zero rows of A−I); rows NOT in dynamics_u_rows must be zero rows of
    B — the blocksparse backward contracts over the declared rows only."""
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet(), dtype=jnp.float64)
    ocp = prob.ocp
    assert ocp.dynamics_x_rows is not None and ocp.dynamics_u_rows is not None
    eye = np.eye(ocp.nx)
    for seed in range(3):
        x, u, p = _random_xup(ocp, jax.random.key(20 + seed), jnp.float64)
        A = np.asarray(jax.jacfwd(lambda x_: ocp.step(x_, u, p, ocp.dt))(x))
        B = np.asarray(jax.jacfwd(lambda u_: ocp.step(x, u_, p, ocp.dt))(u))
        not_x = sorted(set(range(ocp.nx)) - set(ocp.dynamics_x_rows))
        not_u = sorted(set(range(ocp.nx)) - set(ocp.dynamics_u_rows))
        assert np.all((A - eye)[not_x] == 0.0)
        assert np.all(B[not_u] == 0.0)


def test_blocksparse_backward_matches_split():
    """solve_batch with backward_contract="blocksparse" reproduces the
    dense split path (same algebra, reassociated — f64-tight)."""
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet(), dtype=jnp.float64)

    B = 4
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
    x0 = x0.at[:, 19].add(jnp.linspace(0.0, 0.3, B))  # push rdot_x
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    outs = []
    for contract in ("blocksparse", "split"):
        s = MSDDP(prob.ocp, DDPOptions(max_iters=5,
                                       backward_contract=contract))
        sols = jax.vmap(s.init)(x0)
        outs.append(s.solve_batch(sols, x0, params))
    np.testing.assert_allclose(
        np.asarray(outs[0].cost), np.asarray(outs[1].cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].X), np.asarray(outs[1].X), rtol=1e-7, atol=1e-9
    )
    assert np.array_equal(
        np.asarray(outs[0].iterations), np.asarray(outs[1].iterations)
    )


def test_solver_fast_path_matches_ad_path():
    """End-to-end: solve_batch with the analytic linearization equals the
    jacfwd path (same iterates, f64-tight)."""
    import dataclasses

    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet(), dtype=jnp.float64)
    ocp_fast = prob.ocp
    ocp_ad = dataclasses.replace(ocp_fast, stage_jacobians=None)

    B = 4
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), ocp_fast.params
    )
    outs = []
    for ocp, opts in (
        (ocp_fast, DDPOptions(max_iters=5, analytic_jacobians=True,
                              gram_row_pruning=True)),
        (ocp_ad, DDPOptions(max_iters=5)),
    ):
        s = MSDDP(ocp, opts)
        sols = jax.vmap(s.init)(x0)
        outs.append(s.solve_batch(sols, x0, params))
    np.testing.assert_allclose(
        np.asarray(outs[0].cost), np.asarray(outs[1].cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].X), np.asarray(outs[1].X), rtol=1e-7, atol=1e-9
    )


def test_dynamics_u_col_sparsity_metadata_complete():
    """Columns NOT in dynamics_u_cols must be identically-zero columns of
    B. For isrbd the forces are pure residual/constraint variables — only
    the acceleration inputs drive the double integrator
    (isrbd_example.py:109-135) — and the column-sparse backward relies on
    the declaration being complete."""
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem

    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet())
    ocp = prob.ocp
    assert ocp.dynamics_u_cols is not None
    rng = np.random.RandomState(3)
    for _ in range(3):
        x = jnp.asarray(
            np.asarray(prob.initial_state) + 0.05 * rng.standard_normal(ocp.nx)
        )
        u = jnp.asarray(
            np.asarray(prob.static_input) + 0.3 * rng.standard_normal(ocp.nu)
        )
        p = {k: jnp.asarray(v[2]) for k, v in ocp.params.items()}
        B = np.asarray(jax.jacfwd(lambda u_: ocp.step(x, u_, p, ocp.dt))(u))
        dead = sorted(set(range(ocp.nu)) - set(ocp.dynamics_u_cols))
        live = sorted(ocp.dynamics_u_cols)
        assert np.all(B[:, dead] == 0.0)
        assert np.any(B[:, live] != 0.0)
