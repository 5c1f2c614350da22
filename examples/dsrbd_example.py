#!/usr/bin/env python
"""Closed-loop SRBD MPC at 10 Hz — the reference dsrbd_example.py capability
(reference python/dsrbd_example.py:1-185) without ROS: quaternion base
orientation, contact forces, force-switch gait costs, Newton–Euler fidelity
telemetry (/srbd_constraint analog)."""

from common import parse_args, run_closed_loop, setup


def main():
    args = parse_args("dsrbd_example")
    dtype = setup(args)

    import jax.numpy as jnp

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    # solver options follow dsrbd_example.py:56-58
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=100, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(
        c_init_z=float(prob.initial_foot_position[0, 2]),
        nodes=cfg.ns,
        dtype=dtype,
    )
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
    run_closed_loop(loop, prob, args, dtype)


if __name__ == "__main__":
    main()
