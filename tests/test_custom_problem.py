"""User-defined-problem surface: the cartpole swing-up example
(examples/cartpole_example.py) — an OCP outside the shipped locomotion
families — must solve offline, run closed-loop MPC, and take the batched
TPU hot path (blocksparse + sliced) unmodified. This is the X6 (Horizon
general trajectory-optimization framework) parity check from the user's
side: arbitrary dynamics/cost registration, not just the built-ins
(SURVEY.md §2.2 X6; reference prb.py is itself such a user build)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from cartpole_example import build_cartpole_ocp
from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.solvers.msddp import MSDDP


class TestCartpoleSwingUp:
    def test_offline_swingup_reaches_upright(self):
        ocp, x0 = build_cartpole_ocp()
        solver = MSDDP(ocp, DDPOptions(
            max_iters=200, alpha_converge_threshold=1e-12, beta=1e-4,
            cost_reduction_ths=1e-12,
        ))
        sol = jax.jit(solver.solve)(solver.init(x0), x0, ocp.params)
        assert float(sol.defect_norm) < 1e-9
        assert abs(float(sol.X[-1, 1])) < 0.05   # pole upright at horizon end
        assert abs(float(sol.X[-1, 0])) < 0.5    # cart near centre

    def test_closed_loop_mpc_holds_upright(self):
        ocp, x0 = build_cartpole_ocp()
        offline = MSDDP(ocp, DDPOptions(
            max_iters=200, alpha_converge_threshold=1e-12, beta=1e-4,
            cost_reduction_ths=1e-12,
        ))
        sol = jax.jit(offline.solve)(offline.init(x0), x0, ocp.params)
        online = MSDDP(ocp, DDPOptions(
            max_iters=5, alpha_converge_threshold=1e-12, beta=1e-4,
        ))
        tick = jax.jit(online.solve)
        x = x0
        for _ in range(60):
            sol = tick(sol, x, ocp.params)
            x = ocp.step(x, sol.U[0], ocp.params_at(ocp.params, 0), ocp.dt)
            assert bool(jnp.all(jnp.isfinite(x)))
        assert abs(float(x[1])) < 0.1            # theta stays near upright
        assert abs(float(x[3])) < 0.5            # settled

    def test_batched_hot_path_matches_single(self):
        """The same user OCP through solve_batch (lane-major blocksparse +
        sliced linearize) must match per-member solve()."""
        ocp, x0 = build_cartpole_ocp()
        B = 4
        x0s = jnp.tile(x0[None], (B, 1)).at[:, 1].add(
            jnp.linspace(-0.3, 0.3, B)
        )
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), ocp.params
        )
        solver = MSDDP(ocp, DDPOptions(
            max_iters=30, alpha_converge_threshold=1e-12, beta=1e-4,
        ))
        batched = solver.solve_batch(
            jax.vmap(solver.init)(x0s), x0s, params
        )
        singles = [
            solver.solve(solver.init(x0s[i]),
                         x0s[i], jax.tree.map(lambda a: a[i], params))
            for i in range(B)
        ]
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(batched.X[i]), np.asarray(singles[i].X),
                rtol=1e-7, atol=1e-9,
            )
