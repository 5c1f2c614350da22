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
        make_mesh, replicate_params, shard_batch, sharded_monitored_tick,
    )
    from srbd_horizon_tpu.runtime.health import HealthMonitor
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
    # failure detection + in-place recovery for the whole fleet (the
    # reference never checks is_converged, ddp.py:106; here every tick is
    # classified and divergent members are rebuilt from the safe stance)
    monitor = HealthMonitor()
    tick = sharded_monitored_tick(loop, monitor, mesh, prob.initial_state)

    chaos_tick = args.ticks // 2 if args.chaos else -1
    for t in range(args.ticks):
        if t == chaos_tick:
            # chaos injection: corrupt member 3 with NaN state and shove
            # member 5 sideways at 10 m/s — the monitor must detect and
            # reset them while the rest of the fleet is untouched
            x = carries.x
            x = x.at[3].set(jnp.nan)
            x = x.at[5, loop.ocp.state_layout.slices["rdot"]].add(
                jnp.asarray([10.0, 0.0, 0.0], dtype)
            )
            carries = carries._replace(x=shard_batch(mesh, x))
            print(f"t={t:3d}  chaos: NaN into member 3, 10 m/s push into member 5")
        action = jnp.full((B,), 1 if t >= args.walk_start else 0, jnp.int32)
        inp = TickInput(
            action=action,
            rdot_ref=jnp.stack(
                [vx, jnp.zeros(B, dtype), jnp.zeros(B, dtype)], axis=1
            ),
            w_ref=jnp.zeros((B, 3), dtype),
        )
        carries, outs, metrics = tick(carries, inp)
        n_bad = int(metrics["n_unhealthy"])
        if t % 10 == 0 or n_bad:
            print(
                f"t={t:3d}  mean_cost={float(metrics['mean_cost']):10.2f}  "
                f"max_defect={float(metrics['max_defect']):.2e}  "
                f"max_srbd_residual={float(metrics['max_srbd_residual']):.3f}  "
                f"unhealthy={n_bad}"
            )

    X = np.asarray(carries.x)
    print(f"final CoM x: min={X[:,0].min():.3f} max={X[:,0].max():.3f} "
          f"(fast scenarios walk farther)")
    assert np.all(np.isfinite(X))


if __name__ == "__main__":
    main()
