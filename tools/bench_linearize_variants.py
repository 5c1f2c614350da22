"""A/B the linearization + Gram paths on the current backend via warm
steady-state batched MPC ticks (see tools/bench_backward_variants.py for
why other timing methods are untrustworthy there):

  ad+dense        jacfwd linearize, 73-row Gram products (round-1 path)
  analytic+dense  closed-form stage Jacobians, dense Grams
  ad+pruned       jacfwd linearize, row-pruned Grams
  analytic+pruned closed-form + pruned (the intended production path)

Usage: python tools/bench_linearize_variants.py [batch] [reps]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench_variant(batch, analytic, pruned, reps=10):
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    ocp = prob.ocp
    if not analytic:
        ocp = dataclasses.replace(ocp, stage_jacobians=None)
    if not pruned:
        ocp = dataclasses.replace(
            ocp, residual_x_rows=None, residual_u_rows=None
        )
    solver = MSDDP(
        ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3,
                   analytic_jacobians=analytic, gram_row_pruning=pruned),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=ocp.constants)

    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    carries = jax.vmap(loop.init)(x0)
    vtick = jax.jit(loop.tick_batch)
    inp = TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0], dtype)[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), dtype),
    )
    for _ in range(3):
        carries, out = vtick(carries, inp)
    float(jnp.sum(out.u0))  # host read = true drain on this backend
    t0 = time.perf_counter()
    for _ in range(reps):
        carries, out = vtick(carries, inp)
    float(jnp.sum(out.u0))
    dt_tick = (time.perf_counter() - t0) / reps
    md = float(np.max(np.asarray(out.defect_norm)))
    name = f"{'analytic' if analytic else 'ad':8s}+{'pruned' if pruned else 'dense '}"
    print(
        f"{name}: {dt_tick*1e3:8.2f} ms/tick  {B/dt_tick:9.0f} solve/s  "
        f"max_defect={md:.2e}",
        flush=True,
    )
    return dt_tick


def main(batch=1024, reps=10):
    print(f"device={jax.devices()[0]} batch={batch}")
    for analytic in (False, True):
        for pruned in (False, True):
            bench_variant(batch, analytic, pruned, reps)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(b, r)
