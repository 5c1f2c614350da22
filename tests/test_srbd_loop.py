"""SRBD closed-loop MPC — the dsrbd_example.py capability (SURVEY.md §7.3
second milestone): quaternion states, contact forces, force-switch costs,
Newton–Euler telemetry."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import (
    MPCLoop,
    standing_schedule,
    walking_schedule,
)
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _make_loop(max_iters=30):
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=max_iters, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(
        c_init_z=float(prob.initial_foot_position[0, 2]),
        nodes=cfg.ns,
        dtype=jnp.float64,
    )
    loop = MPCLoop(
        solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants
    )
    return prob, loop


class TestSRBDSolve:
    def test_single_solve_standing(self):
        """One solve from nominal: forces ≈ weight/4 upward, CoM stays."""
        prob, loop = _make_loop(max_iters=100)
        sol = loop.solver.solve(
            loop.solver.init(prob.initial_state, U0=jnp.tile(
                prob.static_input[None], (prob.ocp.ns, 1))),
            prob.initial_state,
            prob.ocp.params,
        )
        d = loop.solver.solution_dict(sol)
        assert float(sol.defect_norm) < 1e-6
        # vertical force ≈ m g / 4 per contact (in kN units)
        fz_expect = prob.mass * 9.81 / prob.force_scaling / 4
        for i in range(4):
            fz = np.asarray(d[f"f{i}"][:, 2])
            np.testing.assert_allclose(fz, fz_expect, atol=0.05)
        # quaternion stays near identity
        np.testing.assert_allclose(
            np.asarray(d["o"][-1]), [0, 0, 0, 1], atol=1e-2
        )


class TestClosedLoopSRBD:
    def test_standing(self):
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        T = 30
        carry, out = jax.jit(loop.run)(carry, standing_schedule(T, jnp.float64))
        X = np.asarray(out.x)
        assert np.all(np.isfinite(X))
        np.testing.assert_allclose(X[-1, 0:3], np.asarray(prob.com), atol=0.02)
        # quaternion remains unit & near identity
        np.testing.assert_allclose(X[-1, 3:7], [0, 0, 0, 1], atol=5e-3)
        # Newton–Euler fidelity signal stays small (the /srbd_constraint
        # oracle, dsrbd_example.py:163-175); units: kN / kN·m
        assert float(np.max(np.abs(np.asarray(out.srbd_residual)))) < 0.5

    def test_walking(self):
        """Stable SRBD walk with forward progress and healthy solver."""
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        T = 120
        sched = walking_schedule(T, vx=0.3, start=10, dtype=jnp.float64)
        carry, out = jax.jit(loop.run)(carry, sched)
        X = np.asarray(out.x)
        assert np.all(np.isfinite(X))
        r = X[:, 0:3]
        assert np.all(np.abs(r[:, 2] - 0.88) < 0.08), r[:, 2].min()
        assert r[-1, 0] > 0.8, f"final CoM x = {r[-1, 0]}"
        # orientation stays upright through the walk
        quats = X[:, 3:7]
        assert np.all(np.abs(quats[:, :3]) < 0.2)
        assert float(np.max(out.defect_norm)) < 1e-4


class TestSRBDJump:
    def test_jump_releases_forces(self):
        """'jumping' motion (dsrbd_example.py:92,128-129): cdot_switch→0
        activates the force-off cost (prb.py:203-204) — during the jump
        window planned contact forces collapse toward zero and the loop
        stays finite through landing."""
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        T = 20
        from srbd_horizon_tpu.runtime.loop import TickInput
        # 8 stance ticks, then a 12-tick jump burst: the jump writes enter
        # at the terminal node and migrate one node per tick, so after the
        # burst the PLAN's last 12 nodes carry cdot_switch=0
        actions = jnp.concatenate([
            jnp.zeros(8, jnp.int32),
            jnp.full((12,), 2, jnp.int32),
        ])
        sched = TickInput(
            action=actions,
            rdot_ref=jnp.zeros((T, 3), jnp.float64),
            w_ref=jnp.zeros((T, 3), jnp.float64),
        )
        carry, out = jax.jit(loop.run)(carry, sched)
        assert bool(jnp.all(jnp.isfinite(out.x)))
        # plan inputs: [cddot_i(3), f_i(3)] interleaved; vertical forces 5::6
        U = np.asarray(carry.sol.U)
        fz = U[:, 5::6].sum(axis=1)          # total planned vertical force/node
        weight = prob.mass * 9.81 / prob.force_scaling
        # horizon head (still stance-scheduled): carries the weight
        assert fz[0] > 0.5 * weight, fz[:5]
        # horizon tail (jump-scheduled): forces released toward zero
        assert fz[-1] < 0.2 * weight, fz[-5:]
        # switches confirm the schedule migrated as expected
        sw = np.asarray(carry.params["cdot_switch"])
        assert sw[-1].max() == 0.0 and sw[0].min() == 1.0


class TestShiftWarmstart:
    def test_shifted_warmstart_same_walk(self):
        """MPCLoop.shift_warmstart (beyond-reference): rolling the
        previous plan one node forward before the solve must preserve
        walk quality (the converged solution is warm-start independent)
        while not increasing iterations."""
        import dataclasses

        prob, loop = _make_loop(max_iters=5)
        loop_s = dataclasses.replace(loop, shift_warmstart=True)
        sched = walking_schedule(80, vx=0.3, start=10, dtype=jnp.float64)
        results = {}
        for name, lp in (("plain", loop), ("shift", loop_s)):
            carry = lp.init(prob.initial_state)
            carry, out = jax.jit(lp.run)(carry, sched)
            results[name] = out
        for name, out in results.items():
            X = np.asarray(out.x)
            assert np.all(np.isfinite(X)), name
            assert np.all(np.abs(X[:, 2] - 0.89) < 0.03), name
            assert X[-1, 0] - X[0, 0] > 0.4, name
        it_plain = float(np.mean(np.asarray(results["plain"].iterations)))
        it_shift = float(np.mean(np.asarray(results["shift"].iterations)))
        assert it_shift <= it_plain + 0.25, (it_shift, it_plain)
        # trajectories agree closely (same fixed point, different path)
        dx = np.max(np.abs(np.asarray(results["plain"].x)
                           - np.asarray(results["shift"].x)))
        assert dx < 0.05, dx
