"""Equivalence tests for the TPU-oriented solver execution modes:
associative-scan Riccati vs sequential scan, and linear (associative)
forward pass vs nonlinear rollout (SURVEY.md §7.4 item 5)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _random_iterate(prob, seed=0):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    ns, nx, nu = prob.ocp.ns, prob.ocp.nx, prob.ocp.nu
    X = jnp.tile(prob.initial_state[None], (ns + 1, 1))
    X = X + 0.05 * jax.random.normal(k1, X.shape, X.dtype)
    U = 0.1 * jax.random.normal(k2, (ns, nu), X.dtype)
    return X, U


class TestBackwardEquivalence:
    def test_srbd_gains_match(self):
        """Associative Riccati must reproduce the sequential sweep exactly
        (same k, K, ΔV₁, ΔV₂) on a generic nonlinear iterate."""
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(prob.ocp, DDPOptions())
        X, U = _random_iterate(prob)
        lin = solver._linearize(X, U, prob.ocp.params)
        mu = jnp.asarray(1e-6, jnp.float64)
        ks_s, Ks_s, d1_s, d2_s = solver._backward(lin, mu)
        ks_a, Ks_a, d1_a, d2_a = solver._backward_associative(lin, mu)
        np.testing.assert_allclose(np.asarray(ks_a), np.asarray(ks_s),
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(np.asarray(Ks_a), np.asarray(Ks_s),
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(float(d1_a), float(d1_s), rtol=1e-8)
        np.testing.assert_allclose(float(d2_a), float(d2_s), rtol=1e-8)


class TestModeEquivalence:
    def _solve(self, riccati, forward):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(
                max_iters=60, alpha_converge_threshold=1e-12, beta=1e-3,
                riccati_mode=riccati, forward_pass=forward,
            ),
        )
        x0 = prob.initial_state
        params = dict(prob.ocp.params)
        params["rdot_ref"] = params["rdot_ref"].at[-1].set(
            jnp.array([0.2, 0.1, 0.0]))
        sol = solver.solve(solver.init(x0), x0, params)
        return solver, sol

    def test_all_modes_reach_same_solution(self):
        _, ref = self._solve("sequential", "nonlinear")
        for riccati in ("associative", "sequential"):
            for forward in ("nonlinear", "linear"):
                if (riccati, forward) == ("sequential", "nonlinear"):
                    continue
                _, sol = self._solve(riccati, forward)
                # same optimum: state trajectories agree tightly, inputs
                # agree at optimizer tolerance
                np.testing.assert_allclose(
                    np.asarray(sol.X), np.asarray(ref.X), atol=5e-5,
                    err_msg=f"{riccati}/{forward}",
                )
                assert float(sol.defect_norm) < 1e-6, (riccati, forward)
