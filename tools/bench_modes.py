"""Compare solver execution modes on the current backend: full warm MPC-tick
latency for each (riccati_mode, forward_pass, ls_width) combination.

Usage: python tools/bench_modes.py [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def bench_combo(batch, riccati, forward, ls_width, reps=5):
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
            riccati_mode=riccati, forward_pass=forward,
            parallel_line_search_width=ls_width,
        ),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)

    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    carries = jax.vmap(loop.init)(x0)
    vtick = jax.jit(jax.vmap(loop.tick))
    inp = TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0], dtype)[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), dtype),
    )
    carries, out = vtick(carries, inp)
    carries, out = vtick(carries, inp)
    jax.block_until_ready(carries)
    t0 = time.perf_counter()
    for _ in range(reps):
        carries, out = vtick(carries, inp)
    jax.block_until_ready(carries)
    dt_tick = (time.perf_counter() - t0) / reps
    import numpy as np
    md = float(np.max(np.asarray(out.defect_norm)))
    print(
        f"riccati={riccati:11s} forward={forward:9s} ls={ls_width:2d}: "
        f"{dt_tick*1e3:8.2f} ms/tick  {B/dt_tick:9.0f} solve/s  "
        f"max_defect={md:.2e}"
    )
    return dt_tick


def main(batch=1024):
    print(f"device={jax.devices()[0]} batch={batch}")
    for riccati in ("sequential", "associative"):
        for forward in ("nonlinear", "linear"):
            bench_combo(batch, riccati, forward, 4)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
