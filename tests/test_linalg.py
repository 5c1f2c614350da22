"""Batched small-matrix linear algebra vs NumPy (math/linalg.py)."""

import numpy as np
import jax.numpy as jnp

from srbd_horizon_tpu.math.linalg import spd_inverse, spd_solve
from srbd_horizon_tpu.math.quat import solve3x3

RNG = np.random.default_rng(3)


def _rand_spd(n, batch=(), cond=None):
    A = RNG.normal(size=batch + (n, n))
    A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    if cond is not None:
        # force a target condition number via eigenvalue rescale
        w, V = np.linalg.eigh(A)
        w = np.linspace(1.0 / cond, 1.0, n)
        A = (V * w[..., None, :]) @ np.swapaxes(V, -1, -2)
    return A


class TestSPDInverse:
    def test_sizes(self):
        for n in (1, 2, 3, 5, 8, 15, 24, 37):
            A = _rand_spd(n)
            got = np.asarray(spd_inverse(jnp.array(A)))
            np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-9,
                                       atol=1e-10)

    def test_batched(self):
        A = _rand_spd(24, batch=(7,))
        got = np.asarray(spd_inverse(jnp.array(A)))
        np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-9,
                                   atol=1e-10)

    def test_ill_conditioned(self):
        """κ=1e8 (the 1e6-penalty GN regime): residual accuracy consistent
        with κ·ε in float64."""
        A = _rand_spd(24, cond=1e8)
        iA = np.asarray(spd_inverse(jnp.array(A)))
        err = np.abs(iA @ A - np.eye(24)).max()
        assert err < 1e-6, err

    def test_solve(self):
        A = _rand_spd(24, batch=(4,))
        b = RNG.normal(size=(4, 24, 3))
        x = np.asarray(spd_solve(jnp.array(A), jnp.array(b)))
        np.testing.assert_allclose(A @ x, b, atol=1e-9)


class TestSolve3x3:
    def test_vs_numpy(self):
        A = RNG.normal(size=(5, 3, 3)) + 3 * np.eye(3)
        b = RNG.normal(size=(5, 3))
        x = np.asarray(solve3x3(jnp.array(A), jnp.array(b)))
        want = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, want, rtol=1e-9, atol=1e-10)
