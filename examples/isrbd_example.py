#!/usr/bin/env python
"""Full-NLP SRBD MPC — the reference isrbd_example.py capability
(reference python/isrbd_example.py:1-517) without ROS/IPOPT:

  1. offline AL-DDP solve of the constrained OCP (active friction cones,
     force boxes, hybrid SRBD→LIP dynamics constraint schedule, LIP-zone
     consistency) — the IPOPT offline seed (isrbd_example.py:361-369)
  2. online open-loop MPC: warm-start from the previous solution, pin the
     node-1 state as the next initial state, single-outer-iteration AL
     resolve per tick (isrbd_example.py:419-477)
"""

from common import parse_args, setup

import numpy as np


def main():
    args = parse_args("isrbd_example")
    dtype = setup(args)

    import jax
    import jax.numpy as jnp

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.io.telemetry import TelemetryRecorder
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP, ALOptions
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    cfg = SRBDConfig(dtype=dtype)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet())
    solver = ALDDP(
        prob.ocp,
        ddp_opts=DDPOptions(
            max_iters=15, alpha_converge_threshold=1e-12, beta=1e-3
        ),
        # ρ capped at the f32-safe 1e5: with the scaled equality stack
        # (ocp/spec.py::OCP.eq_scale) the AL converges there, and the f32
        # violation trace matches f64 tick for tick — so the same config
        # serves both the f64 CPU run and f32 TPU fleet serving
        # (solvers/options.py::al_serving_options).
        al_opts=ALOptions(outer_iters=6, rho0=1e3, rho_max=1e5),
    )

    # offline seed solve (isrbd_example.py:361-369)
    x0 = prob.initial_state
    U0 = jnp.tile(prob.static_input[None], (cfg.ns, 1))
    st = jax.jit(solver.solve)(solver.init(x0, U0=U0), x0, prob.ocp.params)
    print(f"offline solve: violation={float(st.viol):.2e} "
          f"cost={float(st.sol.cost):.2f}")

    # online open-loop MPC (isrbd_example.py:419-477)
    wpg = WalkingPatternGenerator.build(c_init_z=0.0, nodes=cfg.ns, dtype=dtype)
    params = dict(prob.ocp.params)
    wpg_state = wpg.init_state()
    online = jax.jit(solver.solve_online)
    rec = TelemetryRecorder()

    for t in range(args.ticks):
        action = 1 if t >= args.walk_start else 0
        params, wpg_state = wpg.advance(params, wpg_state, action)
        params["rdot_ref"] = params["rdot_ref"].at[1:].set(
            jnp.array([args.vx, args.vy, 0.0], dtype)
        )  # isrbd assigns rdot_ref on all nodes 1..ns (isrbd_example.py:461)
        x0 = st.sol.X[1]  # open loop: pin node-1 (isrbd_example.py:425-431)
        rec.tick_start()
        st = online(st, x0, params)
        jax.block_until_ready(st.sol.cost)
        rec.record(
            x=x0, cost=st.sol.cost, viol=st.viol,
            defect_norm=st.sol.defect_norm,
        )

    rec.save(args.out)
    print("summary:", rec.summary())
    print("final violation:", float(st.viol))
    print("final CoM:", np.asarray(st.sol.X[1][:3]))


if __name__ == "__main__":
    main()
