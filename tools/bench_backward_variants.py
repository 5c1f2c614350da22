"""A/B the lane-major backward variants on the current backend with the
only timing method that is trustworthy there: warm steady-state MPC ticks
(many dependent solve_batch calls, drained by a host read). Single-phase
timings and chained microbenchmarks both get memoized/queued on the
remote-execution path (see tools/roofline.py notes).

Usage: python tools/bench_backward_variants.py [batch] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench_variant(batch, contract, unroll, reps=10, roll_unroll=1):
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(
            max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3,
            backward_contract=contract, backward_unroll=unroll,
            rollout_unroll=roll_unroll,
        ),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)

    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    carries = jax.vmap(loop.init)(x0)
    # the production lane-major path (solve_batch) — NOT vmap(tick), which
    # routes through the single-member backward and ignores these knobs
    vtick = jax.jit(loop.tick_batch)
    inp = TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0], dtype)[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), dtype),
    )
    for _ in range(3):  # warm up into gait steady state
        carries, out = vtick(carries, inp)
    float(jnp.sum(out.u0))  # host read = true drain on this backend
    t0 = time.perf_counter()
    for _ in range(reps):
        carries, out = vtick(carries, inp)
    float(jnp.sum(out.u0))
    dt_tick = (time.perf_counter() - t0) / reps
    md = float(np.max(np.asarray(out.defect_norm)))
    print(
        f"contract={contract:8s} unroll={unroll} roll_unroll={roll_unroll}: "
        f"{dt_tick*1e3:8.2f} ms/tick  {B/dt_tick:9.0f} solve/s  "
        f"max_defect={md:.2e}",
        flush=True,
    )
    return dt_tick


def main(batch=1024, reps=10):
    print(f"device={jax.devices()[0]} batch={batch}")
    for contract in ("split", "blocksparse"):
        for unroll in (1, 2):
            bench_variant(batch, contract, unroll, reps)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(b, r)
