"""Cache-blocked fleet execution (`runtime.chunked.chunk_map`): chunked
evaluation must match the unchunked call member-for-member — it is an
execution strategy (cache blocking past the batch knee, BENCH_NOTES.md),
not a semantic change. Tolerances are last-ulp: the chunk reshape
retiles XLA's reductions, nothing more."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.chunked import chunk_map
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _setup(B):
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    key = jax.random.key(3)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float64)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    return cfg, prob, solver, x0, params


class TestChunkMap:
    def test_solve_batch_member_identical(self):
        _, prob, solver, x0, params = _setup(B=8)
        sols0 = jax.vmap(solver.init)(x0)
        ref = jax.jit(solver.solve_batch)(sols0, x0, params)
        got = jax.jit(chunk_map(solver.solve_batch, 2))(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=0, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=0, atol=1e-13
        )
        np.testing.assert_array_equal(
            np.asarray(got.converged), np.asarray(ref.converged)
        )
        np.testing.assert_array_equal(
            np.asarray(got.iterations), np.asarray(ref.iterations)
        )

    def test_tick_batch_member_identical(self):
        cfg, prob, solver, x0, params = _setup(B=6)
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
        loop = MPCLoop(
            solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants
        )
        inp = TickInput(
            action=jnp.array([0, 1, 1, 2, 1, 0], jnp.int32),
            rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0])[None], (6, 1)),
            w_ref=jnp.zeros((6, 3)),
        )
        c_ref = jax.vmap(loop.init)(x0)
        c_got = jax.vmap(loop.init)(x0)
        tick_ref = jax.jit(loop.tick_batch)
        tick_got = jax.jit(chunk_map(loop.tick_batch, 3))
        for _ in range(3):
            c_ref, o_ref = tick_ref(c_ref, inp)
            c_got, o_got = tick_got(c_got, inp)
        np.testing.assert_allclose(
            np.asarray(o_got.x), np.asarray(o_ref.x), rtol=0, atol=1e-12
        )
        # the WPG shift is pure indexing — exact
        np.testing.assert_array_equal(
            np.asarray(c_got.params["c_ref"]),
            np.asarray(c_ref.params["c_ref"]),
        )

    def test_single_chunk_passthrough(self):
        _, _, solver, x0, params = _setup(B=4)
        sols0 = jax.vmap(solver.init)(x0)
        ref = solver.solve_batch(sols0, x0, params)
        got = chunk_map(solver.solve_batch, 4)(sols0, x0, params)
        np.testing.assert_array_equal(np.asarray(got.X), np.asarray(ref.X))

    def test_ragged_batch_rejected(self):
        _, _, solver, x0, params = _setup(B=5)
        sols0 = jax.vmap(solver.init)(x0)
        with pytest.raises(ValueError, match="not a multiple"):
            chunk_map(solver.solve_batch, 2)(sols0, x0, params)

    def test_unbatched_leaf_rejected(self):
        fn = chunk_map(lambda a, b: a + b, 2)
        with pytest.raises(ValueError, match="leading axis"):
            fn(jnp.zeros((4, 3)), jnp.zeros((3, 3)))
