"""Pallas fused backward sweep vs the XLA lane-major reference, in
interpreter mode (CPU). On real TPU the same kernel compiles via Mosaic;
equivalence here pins the algorithm, tolerances are float roundoff."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _batched_lin(solver, prob, B=8, seed=0):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    ns, nx, nu = prob.ocp.ns, prob.ocp.nx, prob.ocp.nu
    X = jnp.tile(prob.initial_state[None, None], (B, ns + 1, 1))
    X = X + 0.05 * jax.random.normal(k1, X.shape, X.dtype)
    U = 0.1 * jax.random.normal(k2, (B, ns, nu), X.dtype)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    return jax.vmap(solver._linearize)(X, U, params)


class TestPallasBackward:
    def test_matches_lanemajor(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        opts = DDPOptions(
            riccati_mode="pallas", pallas_block_batch=4, pallas_interpret=True
        )
        solver = MSDDP(prob.ocp, opts)
        lin = _batched_lin(solver, prob, B=8)
        mu = jnp.asarray(opts.mu0, jnp.float64)

        ks_ref, Ks_ref, d1_ref, d2_ref = solver._backward_lanemajor(lin, mu)
        ks, Ks, d1, d2 = solver._backward_pallas(lin, mu)

        # tolerances: identical algorithm, different contraction order
        np.testing.assert_allclose(
            np.asarray(ks), np.asarray(ks_ref), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(Ks), np.asarray(Ks_ref), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_ref), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), rtol=1e-8)

    def test_full_solve_with_pallas_backward(self):
        """solve_batch with riccati_mode=pallas reaches the same solution
        as the default path."""
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        base = MSDDP(prob.ocp, DDPOptions(max_iters=3))
        pall = MSDDP(
            prob.ocp,
            DDPOptions(
                max_iters=3, riccati_mode="pallas",
                pallas_block_batch=4, pallas_interpret=True,
            ),
        )
        B = 4
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
        )
        sols0 = jax.vmap(base.init)(x0)
        ref = base.solve_batch(sols0, x0, params)
        got = pall.solve_batch(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-8
        )
