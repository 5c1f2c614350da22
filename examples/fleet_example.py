#!/usr/bin/env python
"""Batched scenario fleet — the capability the reference does not have
(SURVEY.md §2.3: the reference is one serial solver at 10 Hz; here one
chip — or a pod slice via the same code path — replans thousands of MPC
scenarios per tick).

Runs B SRBD walking scenarios with varied initial states and commanded
velocities, sharded over all available devices, with ICI-collective fleet
telemetry. On CPU it uses the 8 virtual devices; on TPU, the real chips."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from common import parse_args, setup

import numpy as np


def main():
    args = parse_args("fleet_example")
    dtype = setup(args)

    import jax
    import jax.numpy as jnp

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.parallel.mesh import (
        make_mesh, replicate_params, shard_batch, sharded_batched_tick,
    )
    from srbd_horizon_tpu.parallel.multihost import ensure_initialized, fleet_info
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    ensure_initialized()
    print("fleet:", fleet_info())

    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)

    mesh = make_mesh()
    n_dev = len(mesh.devices.flat)
    B = max(64, 8 * n_dev)
    print(f"devices={n_dev} fleet size={B}")

    key = jax.random.key(0)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, dtype)
    vx = jnp.linspace(0.0, 0.4, B)  # per-scenario commanded speed

    carries = jax.vmap(loop.init)(x0)
    carries = shard_batch(mesh, carries)
    tick = sharded_batched_tick(loop, mesh)

    for t in range(args.ticks):
        action = jnp.full((B,), 1 if t >= args.walk_start else 0, jnp.int32)
        inp = TickInput(
            action=action,
            rdot_ref=jnp.stack(
                [vx, jnp.zeros(B, dtype), jnp.zeros(B, dtype)], axis=1
            ),
            w_ref=jnp.zeros((B, 3), dtype),
        )
        carries, outs, metrics = tick(carries, inp)
        if t % 10 == 0:
            print(
                f"t={t:3d}  mean_cost={float(metrics['mean_cost']):10.2f}  "
                f"max_defect={float(metrics['max_defect']):.2e}  "
                f"max_srbd_residual={float(metrics['max_srbd_residual']):.3f}"
            )

    X = np.asarray(carries.x)
    print(f"final CoM x: min={X[:,0].min():.3f} max={X[:,0].max():.3f} "
          f"(fast scenarios walk farther)")
    assert np.all(np.isfinite(X))


if __name__ == "__main__":
    main()
