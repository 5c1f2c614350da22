"""Topology and dtype configuration coverage: nc=8 (contact_model=4, the
reference's provisioned-but-untested configuration — SRBD_horizon.rviz
provisions 8 wrench displays, prb.py:39-41), point feet (contact_model=1),
and float32 solver quality on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import RobotConstants, point_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.solvers.msddp import MSDDP


def _four_contact_feet() -> RobotConstants:
    """contact_model=4: four contact points per foot (square feet)."""
    pts = []
    for leg_y in (0.0, -0.18):
        for dx, dy in ((0.08, 0.03), (0.08, -0.03), (-0.08, 0.03), (-0.08, -0.03)):
            pts.append([dx, leg_y + dy, 0.0])
    return RobotConstants(
        mass=40.0,
        inertia=np.diag([2.1, 1.8, 0.62]),
        com=np.array([0.0, -0.09, 0.88]),
        foot_positions=np.asarray(pts),
        foot_frames=tuple(f"c{i}" for i in range(8)),
    )


class TestNc8:
    def test_srbd_nc8_solve(self):
        cfg = SRBDConfig(contact_model=4, number_of_legs=2, dtype=jnp.float64)
        assert cfg.nc == 8
        prob = build_srbd_problem(cfg, _four_contact_feet())
        assert prob.ocp.nx == 13 + 6 * 8 == 61
        assert prob.ocp.nu == 6 * 8 == 48
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=30))
        x0 = prob.initial_state
        U0 = jnp.tile(prob.static_input[None], (cfg.ns, 1))
        sol = solver.solve(solver.init(x0, U0=U0), x0, prob.ocp.params)
        assert float(sol.defect_norm) < 1e-6
        d = solver.solution_dict(sol)
        fz_expect = prob.mass * 9.81 / prob.force_scaling / 8
        for i in range(8):
            np.testing.assert_allclose(
                np.asarray(d[f"f{i}"][:, 2]), fz_expect, atol=0.05
            )

    def test_lip_point_feet(self):
        cfg = SRBDConfig(contact_model=1, number_of_legs=2, dtype=jnp.float64)
        assert cfg.nc == 2
        prob = build_lip_problem(cfg, point_feet())
        assert prob.ocp.nx == 6 + 6 * 2
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=30))
        sol = solver.solve(
            solver.init(prob.initial_state), prob.initial_state,
            prob.ocp.params,
        )
        assert float(sol.defect_norm) < 1e-6


class TestF32Quality:
    def test_srbd_f32_cold_solve(self):
        """The TPU production dtype must close defects and hold constraints
        from a cold start (SURVEY.md §7.4 item 1)."""
        from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet

        cfg = SRBDConfig(dtype=jnp.float32)
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=30, alpha_converge_threshold=1e-12, beta=1e-3),
        )
        x0 = prob.initial_state
        sol = solver.solve(solver.init(x0), x0, prob.ocp.params)
        assert sol.X.dtype == jnp.float32
        assert float(sol.defect_norm) < 1e-5
        d = solver.solution_dict(sol)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(d[f"c{i}"][:, 2]), 0.0, atol=5e-3
            )


class TestLineFeetQuadruped:
    def test_srbd_cm2_legs4_solve(self):
        """The other nc=8 corner: contact_model=2 × number_of_legs=4
        (line-feet QUADRUPED — the topology product the reference
        provisions via its 8 wrench displays, SRBD_horizon.rviz:156-261,
        but never instantiates)."""
        import dataclasses

        from srbd_horizon_tpu.models.quadruped import quadruped_point_feet

        q = quadruped_point_feet()
        pts = []
        for p in np.asarray(q.foot_positions):
            pts.append(p + np.array([0.05, 0.0, 0.0]))
            pts.append(p - np.array([0.05, 0.0, 0.0]))
        robot8 = dataclasses.replace(
            q, foot_positions=np.asarray(pts),
            foot_frames=tuple(f"c{i}" for i in range(8)),
        )
        cfg = SRBDConfig(contact_model=2, number_of_legs=4,
                         dtype=jnp.float64)
        assert cfg.nc == 8
        prob = build_srbd_problem(cfg, robot8)
        assert prob.ocp.nx == 61 and prob.ocp.nu == 48
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=20, alpha_converge_threshold=1e-12,
                       beta=1e-3),
        )
        x0 = prob.initial_state
        sol = jax.jit(solver.solve)(solver.init(x0), x0, prob.ocp.params)
        assert bool(sol.converged)
        assert float(sol.defect_norm) < 1e-6
        # standing: total vertical force carries the weight
        d = solver.solution_dict(sol)
        fz = sum(np.asarray(d[f"f{i}"])[:, 2].mean() for i in range(8))
        np.testing.assert_allclose(
            fz, prob.mass * 9.81 / prob.force_scaling, rtol=0.01
        )
