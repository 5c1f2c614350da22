"""A/B the `linearize_precision` option ("f32" vs "bf16") via warm
steady-state batched MPC ticks — the VERDICT-r1 "bf16-safe Jacobian
formation with f32 Riccati" experiment, measured end-to-end (isolated
phase timings are untrustworthy here; see tools/bench_backward_variants.py).

Reports ms/tick, solve/s, mean solver iterations (the failure mode of
inexact Jacobians is MORE iterations, not wrong answers — the merit uses
exact f32 cost), and max defect.

Usage: python tools/bench_linearize_dtype.py [batch] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench_variant(batch, precision, reps=10):
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
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3,
                   linearize_precision=precision),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)

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
    iters = float(np.mean(np.asarray(out.iterations)))
    print(
        f"{precision:5s}: {dt_tick*1e3:8.2f} ms/tick  {B/dt_tick:9.0f} solve/s"
        f"  iters_mean={iters:.2f}  max_defect={md:.2e}",
        flush=True,
    )
    return dt_tick


def main(batch=1024, reps=10):
    print(f"device={jax.devices()[0]} batch={batch}")
    for precision in ("f32", "bf16"):
        bench_variant(batch, precision, reps)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(b, r)
