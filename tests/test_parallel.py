"""Distribution tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded batched solves match unsharded vmap, collective metrics are correct,
and the sharded closed-loop tick runs with device-resident state."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.parallel.mesh import (
    make_mesh,
    replicate_params,
    shard_batch,
    sharded_batched_solve,
    sharded_batched_tick,
)
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


class TestShardedSolve:
    def test_matches_vmap(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=20))
        mesh = make_mesh()
        B = 16  # 2 per device

        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
        params = replicate_params(prob.ocp.params, B)
        sols0 = jax.vmap(solver.init)(x0)

        f = sharded_batched_solve(solver, mesh)
        sols_sh, metrics = f(
            shard_batch(mesh, sols0), shard_batch(mesh, x0),
            shard_batch(mesh, params),
        )
        sols_ref = jax.vmap(solver.solve)(sols0, x0, params)

        np.testing.assert_allclose(
            np.asarray(sols_sh.X), np.asarray(sols_ref.X), atol=1e-8
        )
        # collective metrics agree with host-side reductions
        np.testing.assert_allclose(
            float(metrics["mean_cost"]), float(jnp.mean(sols_ref.cost)),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            float(metrics["max_defect"]), float(jnp.max(sols_ref.defect_norm)),
            atol=1e-12,
        )


class TestShardedTick:
    def test_fleet_tick(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=10))
        wpg = WalkingPatternGenerator.build(
            c_init_z=0.0, nodes=cfg.ns, dtype=jnp.float64
        )
        loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
        mesh = make_mesh()
        B = 8

        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        carries = jax.vmap(lambda x: loop.init(x))(x0)
        carries = shard_batch(mesh, carries)
        tick = sharded_batched_tick(loop, mesh)

        inp = TickInput(
            action=jnp.ones(B, jnp.int32),  # everyone steps
            rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0])[None], (B, 1)),
            w_ref=jnp.zeros((B, 3)),
        )
        for _ in range(3):
            carries, outs, metrics = tick(carries, inp)
        assert np.all(np.isfinite(np.asarray(outs.x)))
        assert float(metrics["max_defect"]) < 1e-4
        # per-scenario WPG state advanced on device
        assert int(np.asarray(carries.wpg_state.step_counter)[0]) == 3


class TestShardedConstrainedTick:
    def test_matches_unsharded(self):
        """Sharded frozen-penalty AL tick (the constrained fleet-serving
        path over a device mesh) must equal the unsharded
        solve_online_batch, and the psum/pmax telemetry must reduce
        globally."""
        from srbd_horizon_tpu.parallel.mesh import sharded_constrained_tick
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
        from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions

        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        solver = ALDDP(
            prob.ocp,
            ddp_opts=DDPOptions(max_iters=5, alpha_converge_threshold=1e-12,
                                beta=1e-3),
            al_opts=ALOptions(outer_iters=2, rho0=1e3, rho_max=1e5),
        )
        mesh = make_mesh()
        B = 8
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0.at[:, 0].add(jnp.linspace(-0.01, 0.01, B))
        U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        params = replicate_params(prob.ocp.params, B)
        st0 = jax.vmap(lambda x: solver.init(x, U0=U0))(x0)
        st = jax.jit(solver.solve_batch)(st0, x0, params)

        ref = jax.jit(solver.solve_online_batch)(st, st.sol.X[:, 1], params)

        tick = sharded_constrained_tick(solver, mesh)
        st_s = shard_batch(mesh, st)
        x0_s = shard_batch(mesh, st.sol.X[:, 1])
        p_s = shard_batch(mesh, params)
        got, metrics = tick(st_s, x0_s, p_s)

        np.testing.assert_allclose(
            np.asarray(got.sol.X), np.asarray(ref.sol.X),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(got.viol), np.asarray(ref.viol), rtol=1e-9,
        )
        np.testing.assert_allclose(
            float(metrics["max_viol"]), float(jnp.max(ref.viol)), rtol=1e-9,
        )
        np.testing.assert_allclose(
            float(metrics["mean_cost"]), float(jnp.mean(ref.sol.cost)),
            rtol=1e-9,
        )


class TestShardedServingTick:
    def test_matches_unsharded(self):
        """The packaged 2-outer serving tick under shard_map
        (parallel.mesh.sharded_serving_tick) must equal the unsharded
        ALDDP.serving_tick_batch member-for-member."""
        from srbd_horizon_tpu.parallel.mesh import sharded_serving_tick
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
        from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions

        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        solver = ALDDP(
            prob.ocp,
            ddp_opts=DDPOptions(max_iters=1, alpha_converge_threshold=1e-12,
                                beta=1e-3),
            al_opts=ALOptions(outer_iters=2, rho0=1e5, rho_max=1e5),
        )
        mesh = make_mesh()
        B = 8
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0.at[:, 0].add(jnp.linspace(-0.01, 0.01, B))
        U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        params = replicate_params(prob.ocp.params, B)
        st0 = jax.vmap(lambda x: solver.init(x, U0=U0))(x0)

        ref = jax.jit(solver.serving_tick_batch)(st0, x0, params)
        tick = sharded_serving_tick(solver, mesh)
        got, metrics = tick(
            shard_batch(mesh, st0), shard_batch(mesh, x0),
            shard_batch(mesh, params),
        )
        np.testing.assert_allclose(
            np.asarray(got.sol.X), np.asarray(ref.sol.X),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(got.viol), np.asarray(ref.viol), rtol=1e-9,
        )
        np.testing.assert_allclose(
            float(metrics["max_viol"]), float(jnp.max(ref.viol)), rtol=1e-9,
        )
