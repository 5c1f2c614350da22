"""Lane-major batched solver path: solve_batch must match vmap(solve)
member-for-member, and tick_batch must match vmap(tick)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _setup(B=5):
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=8, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    key = jax.random.key(7)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float64)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    return cfg, prob, solver, x0, params


class TestSolveBatch:
    def test_matches_vmap(self):
        _, prob, solver, x0, params = _setup()
        sols0 = jax.vmap(solver.init)(x0)
        ref = jax.vmap(solver.solve)(sols0, x0, params)
        got = jax.jit(solver.solve_batch)(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-7, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(got.converged), np.asarray(ref.converged)
        )


class TestTickBatch:
    def test_matches_vmap_tick(self):
        cfg, prob, solver, x0, params = _setup(B=4)
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
        loop = MPCLoop(
            solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants
        )
        carries = jax.vmap(loop.init)(x0)
        inp = TickInput(
            action=jnp.array([0, 1, 1, 2], jnp.int32),
            rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0])[None], (4, 1)),
            w_ref=jnp.zeros((4, 3)),
        )
        c_ref, o_ref = jax.vmap(loop.tick)(carries, inp)
        c_got, o_got = jax.jit(loop.tick_batch)(carries, inp)
        np.testing.assert_allclose(
            np.asarray(o_got.x), np.asarray(o_ref.x), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(c_got.params["c_ref"]),
            np.asarray(c_ref.params["c_ref"]), atol=1e-12,
        )
        # multi-tick consistency
        for _ in range(3):
            c_ref, o_ref = jax.vmap(loop.tick)(c_ref, inp)
            c_got, o_got = loop.tick_batch(c_got, inp)
        np.testing.assert_allclose(
            np.asarray(o_got.x), np.asarray(o_ref.x), rtol=1e-6, atol=1e-7
        )
