#!/usr/bin/env python
"""Closed-loop quadruped trot MPC — a second robot morphology on the same
stack. The reference framework is biped-only (every shipped config is the
Kangaroo); this drives the other corner of its provisioned topology
surface (contact_model=1, number_of_legs=4 — reference prb.py:39-41,
launch:16-17) with a diagonal-pair trot gait
(`WalkingPatternGenerator.group_mask`, models/quadruped.py) through the
identical problem builder / MS-DDP solver / MPC loop."""

from common import parse_args, run_closed_loop, setup


def main():
    args = parse_args("quadruped_example")
    dtype = setup(args)

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.quadruped import (
        QUADRUPED_FOOT_FRAMES, quadruped_point_feet, trot_group_mask,
    )
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    cfg = SRBDConfig(contact_model=1, number_of_legs=4, dtype=dtype)
    prob = build_srbd_problem(cfg, quadruped_point_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(
        c_init_z=float(prob.initial_foot_position[0, 2]),
        nodes=cfg.ns,
        contact_model=cfg.contact_model,
        number_of_legs=cfg.number_of_legs,
        dtype=dtype,
        group_mask=trot_group_mask(),
    )
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
    run_closed_loop(loop, prob, args, dtype,
                    frames=list(QUADRUPED_FOOT_FRAMES))


if __name__ == "__main__":
    main()
