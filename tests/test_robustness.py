"""Production-robustness scenarios beyond the reference's operational
envelope: push recovery mid-walk, and per-scenario terrain offsets in the
gait schedule (SURVEY.md §2.3 — varied-terrain batched sweeps)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, walking_schedule
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _make_loop():
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=20, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
    return prob, MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)


class TestPushRecovery:
    def test_recovers_from_velocity_push(self):
        """Mid-walk, kick the CoM velocity sideways by 0.4 m/s (a shove);
        the MPC must recover: finite states, CoM height held, lateral
        velocity damped back out."""
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        run = jax.jit(loop.run)
        sched1 = walking_schedule(30, vx=0.2, start=5, dtype=jnp.float64)
        carry, out1 = run(carry, sched1)

        # the push: perturb the simulated state's CoM lateral velocity
        nc = prob.nc
        rdot_y_idx = 7 + 3 * nc + 1
        x_pushed = carry.x.at[rdot_y_idx].add(0.4)
        carry = carry._replace(x=x_pushed)

        sched2 = walking_schedule(40, vx=0.2, start=0, dtype=jnp.float64)
        carry, out2 = run(carry, sched2)
        X = np.asarray(out2.x)
        assert np.all(np.isfinite(X))
        assert np.all(np.abs(X[:, 2] - 0.88) < 0.1)
        # lateral CoM velocity damped well below the push by the end
        rdot_y = X[:, rdot_y_idx]
        assert abs(rdot_y[-1]) < 0.15, rdot_y[-5:]
        # solver stayed healthy through the disturbance
        assert float(np.max(np.asarray(out2.defect_norm))) < 1e-4


class TestTerrainOffset:
    def test_steps_onto_raised_terrain(self):
        """Drive the WPG with a terrain offset: contact-height references
        (and the realized contact heights) must follow the new ground."""
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        tick = jax.jit(loop.tick)
        run = jax.jit(loop.run)
        # establish a walk on flat ground
        carry, _ = run(carry, walking_schedule(20, vx=0.2, start=5,
                                               dtype=jnp.float64))
        # now step onto 4 cm terrain: advance the WPG manually with
        # terrain_z (the per-scenario terrain capability). One jitted
        # tick reused 25× — the eager per-tick solve was ~6 s/tick of
        # op-by-op dispatch (the old single slowest test in the suite)
        @jax.jit
        def terrain_tick(carry):
            params, wpg_state = loop.wpg.advance(
                carry.params, carry.wpg_state, 1, terrain_z=0.04
            )
            sol = loop.solver.solve(carry.sol, carry.x, params)
            x_next = loop.ocp.step(
                carry.x, sol.U[0], loop.ocp.params_at(params, 0),
                loop.ocp.dt,
            )
            return carry._replace(
                x=x_next, sol=sol, params=params, wpg_state=wpg_state
            )

        for _ in range(25):
            carry = terrain_tick(carry)
        params = carry.params
        c_ref = np.asarray(params["c_ref"])
        # the whole horizon's stance references have migrated to 4 cm
        assert c_ref.max() > 0.04  # swing apex above terrain
        stance_refs = c_ref[np.asarray(params["cdot_switch"]) > 0.5]
        np.testing.assert_allclose(stance_refs.min(), 0.04, atol=1e-9)
        # realized contact heights follow (1e6 cz_tracking penalty)
        X = np.asarray(carry.x)
        cz = X[[7 + 2, 10 + 2, 13 + 2, 16 + 2]]
        assert cz.max() > 0.03, cz
