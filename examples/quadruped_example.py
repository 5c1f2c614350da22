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
    if args.constrained:
        return constrained_main(args, dtype)

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


def constrained_main(args, dtype):
    """Constrained trot: the full-NLP (AL/isrbd) path — active friction
    cones, force boxes, hybrid SRBD/LIP dynamics constraints — on the
    quadruped morphology, served with the round-4 RTI tick. The LIP
    pendulum height follows the quadruped's CoM (the hybrid stack's
    consistency requirement — problems/isrbd.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srbd_horizon_tpu.config import SRBDConfig
    from srbd_horizon_tpu.io.telemetry import TelemetryRecorder
    from srbd_horizon_tpu.models.quadruped import (
        quadruped_point_feet, trot_group_mask,
    )
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP
    from srbd_horizon_tpu.solvers.options import al_serving_options
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    robot = quadruped_point_feet()
    cfg = SRBDConfig(contact_model=1, number_of_legs=4, dtype=dtype,
                     lip_height=float(robot.com[2]))
    prob = build_isrbd_problem(cfg, robot)
    ddp_off, al_off = al_serving_options(max_iters=15)
    offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
    ddp_on, al_on = al_serving_options(max_iters=1)
    online = ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)

    x0 = prob.initial_state
    U0 = jnp.tile(prob.static_input[None], (cfg.ns, 1))
    st = jax.jit(offline.solve)(offline.init(x0, U0=U0), x0, prob.ocp.params)
    print(f"offline solve: violation={float(st.viol):.2e} "
          f"cost={float(st.sol.cost):.2f}")

    wpg = WalkingPatternGenerator.build(
        0.0, cfg.ns, contact_model=1, number_of_legs=4, dtype=dtype,
        group_mask=trot_group_mask(),
    )
    params = dict(prob.ocp.params)
    wpg_state = wpg.init_state()
    tick = jax.jit(
        lambda st, x0, p: online.solve_online(
            online.solve_online(online.shift_warmstart(st), x0, p), x0, p
        )
    )
    rec = TelemetryRecorder()
    for t in range(args.ticks):
        action = 1 if t >= args.walk_start else 0
        params, wpg_state = wpg.advance(params, wpg_state, action)
        params["rdot_ref"] = params["rdot_ref"].at[1:].set(
            jnp.array([args.vx, args.vy, 0.0], dtype)
        )
        x0 = st.sol.X[1]
        rec.tick_start()
        st = tick(st, x0, params)
        jax.block_until_ready(st.sol.cost)
        rec.record(x=x0, cost=st.sol.cost, viol=st.viol,
                   defect_norm=st.sol.defect_norm)
    rec.save(args.out)
    print("summary:", rec.summary())
    print("final violation:", float(st.viol))
    print("final CoM:", np.asarray(st.sol.X[1][:3]))


if __name__ == "__main__":
    main()
