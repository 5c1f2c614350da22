"""ISRBD sparsity metadata and the AL inner-stack composition.

The isrbd OCP declares stacked-row and dynamics-row sparsity
(problems/isrbd.py) and the AL solver composes row sets for its inner
AL-folded residual stack (solvers/alddp.py) so that batched constrained
solves take the blocksparse backward + sliced linearizer. These tests
enforce the two contracts the fast paths rely on:
  1. completeness — every row NOT in a declared set has identically-zero
     Jacobian there (checked against AD at randomized points);
  2. equivalence — the batched AL solve with composed sparsity matches
     the dense (no-metadata) solve.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _prob():
    cfg = SRBDConfig(dtype=jnp.float64)
    return build_isrbd_problem(cfg, kangaroo_line_feet())


def _random_xup(ocp, key):
    kx, ku, kp = jax.random.split(key, 3)
    x = jnp.zeros(ocp.nx, jnp.float64)
    x = x.at[0:3].set(jnp.array([0.05, -0.07, 0.9]))
    x = x.at[3:7].set(jnp.array([0.1, -0.2, 0.05, 0.97]))  # non-unit quat
    x = x + 0.1 * jax.random.normal(kx, (ocp.nx,), jnp.float64)
    u = 0.5 * jax.random.normal(ku, (ocp.nu,), jnp.float64)
    p = {k: v[3] + 0.1 * jnp.abs(jax.random.normal(kp, v[3].shape,
                                                   jnp.float64))
         for k, v in ocp.params.items()}
    return x, u, p


@pytest.mark.parametrize("seed", [0, 1])
def test_isrbd_residual_rows_complete(seed):
    prob = _prob()
    ocp = prob.ocp
    solver = MSDDP(ocp, DDPOptions())
    x, u, p = _random_xup(ocp, jax.random.key(seed))
    Jx = np.asarray(jax.jacfwd(lambda x_: solver._stage_rho(x_, u, p))(x))
    Ju = np.asarray(jax.jacfwd(lambda u_: solver._stage_rho(x, u_, p))(u))
    nr = Jx.shape[0]
    assert nr == max(max(ocp.residual_x_rows), max(ocp.residual_u_rows)) + 1
    not_x = sorted(set(range(nr)) - set(ocp.residual_x_rows))
    not_u = sorted(set(range(nr)) - set(ocp.residual_u_rows))
    assert np.all(Jx[not_x] == 0.0)
    assert np.all(Ju[not_u] == 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_isrbd_dynamics_rows_complete(seed):
    prob = _prob()
    ocp = prob.ocp
    x, u, p = _random_xup(ocp, jax.random.key(10 + seed))
    A = np.asarray(jax.jacfwd(lambda x_: ocp.step(x_, u, p, ocp.dt))(x))
    B = np.asarray(jax.jacfwd(lambda u_: ocp.step(x, u_, p, ocp.dt))(u))
    not_x = sorted(set(range(ocp.nx)) - set(ocp.dynamics_x_rows))
    not_u = sorted(set(range(ocp.nx)) - set(ocp.dynamics_u_rows))
    assert np.all((A - np.eye(ocp.nx))[not_x] == 0.0)
    assert np.all(B[not_u] == 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_inner_composed_rows_complete(seed):
    """The AL-composed inner row sets must be complete for the inner
    residual stack — with ACTIVE multipliers, so the one-sided max(0,·)
    box/cone rows are exercised on their live branch."""
    prob = _prob()
    solver = ALDDP(prob.ocp, ddp_opts=DDPOptions(max_iters=2),
                   al_opts=ALOptions(outer_iters=1))
    inner = solver._inner
    assert inner.ocp.residual_x_rows is not None
    x, u, p_outer = _random_xup(prob.ocp, jax.random.key(20 + seed))

    # state with strictly positive multipliers → every AL row active
    st = solver.init(prob.initial_state)
    st = st._replace(
        lam_eq=st.lam_eq + 0.3, lam_eq_T=st.lam_eq_T + 0.3,
        mu_ub=st.mu_ub + 0.5, mu_lb=st.mu_lb + 0.5,
        mu_x_ub=st.mu_x_ub + 0.5, mu_x_lb=st.mu_x_lb + 0.5,
        mu_u_ub=st.mu_u_ub + 0.5, mu_u_lb=st.mu_u_lb + 0.5,
        rho=jnp.asarray(10.0, jnp.float64),
    )
    params = solver._params_with_multipliers(dict(prob.ocp.params), st)
    p = {k: jnp.asarray(v[3], jnp.float64) for k, v in params.items()}

    Jx = np.asarray(jax.jacfwd(lambda x_: inner._stage_rho(x_, u, p))(x))
    Ju = np.asarray(jax.jacfwd(lambda u_: inner._stage_rho(x, u_, p))(u))
    nr = Jx.shape[0]
    not_x = sorted(set(range(nr)) - set(inner.ocp.residual_x_rows))
    not_u = sorted(set(range(nr)) - set(inner.ocp.residual_u_rows))
    assert np.all(Jx[not_x] == 0.0)
    assert np.all(Ju[not_u] == 0.0)
    # and the declared sets are not trivially "everything": the dead box
    # rows (never-bounded dims) and pure-u/pure-x segments are pruned
    assert len(not_x) > 0 and len(not_u) > 0


def test_isrbd_batched_sparse_matches_dense():
    """ALDDP.solve_batch with the composed inner sparsity (blocksparse
    backward + sliced linearize) must reproduce the dense inner path."""
    prob = _prob()
    ocp_dense = dataclasses.replace(
        prob.ocp,
        residual_x_rows=None, residual_u_rows=None,
        dynamics_x_rows=None, dynamics_u_rows=None,
        ineq_x_rows=None, ineq_u_rows=None,
    )
    ddp_opts = DDPOptions(max_iters=6, alpha_converge_threshold=1e-12,
                          beta=1e-3)
    al_opts = ALOptions(outer_iters=2, rho0=1e3, rho_max=1e5)
    B = 3
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0.at[:, 0].add(jnp.linspace(-0.01, 0.01, B))
    U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    outs = []
    for ocp in (prob.ocp, ocp_dense):
        solver = ALDDP(ocp, ddp_opts=ddp_opts, al_opts=al_opts)
        st0 = jax.vmap(lambda x: solver.init(x, U0=U0))(x0)
        outs.append(jax.jit(solver.solve_batch)(st0, x0, params))
    assert outs[0].sol.X.dtype == jnp.float64
    np.testing.assert_allclose(
        np.asarray(outs[0].sol.X), np.asarray(outs[1].sol.X),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].viol), np.asarray(outs[1].viol),
        rtol=1e-8, atol=1e-12,
    )
