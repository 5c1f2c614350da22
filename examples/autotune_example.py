#!/usr/bin/env python
"""Differentiable MPC demo — gradient descent THROUGH the solver.

No reference counterpart (the reference's pyddp is an opaque C++ binary;
reference ddp.py:96-106 returns plain numpy): this is a new capability of
the TPU-native build. Because the MS-DDP solve is a pure jittable
function, `solvers.diff.implicit_solve` exposes exact (Gauss-Newton)
gradients of the optimal plan with respect to every problem parameter via
the implicit function theorem — one extra Riccati sweep per backward pass,
regardless of how many iterations the forward solve took.

The demo is inverse MPC / imitation: a "teacher" plan is produced with a
hidden CoM velocity reference; the learner recovers that reference from
the trajectory alone by plain gradient descent on TPU, then reports the
recovered values. Swap the imitation loss for a task loss (energy, foot
clearance, tracking) to auto-tune references/gains the same way.

Usage: python examples/autotune_example.py [--cpu] [--f64] [--steps N]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description="autotune_example")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=2e2)
    ap.add_argument("--hidden-vx", type=float, default=0.25)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.solvers.diff import implicit_solve
    from srbd_horizon_tpu.solvers.msddp import MSDDP

    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=100, alpha_converge_threshold=1e-12,
                   beta=1e-3, cost_reduction_ths=1e-10),
    )
    fsolve = implicit_solve(solver)

    x0 = prob.initial_state
    sol = solver.init(
        x0, U0=jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
    )
    params = dict(prob.ocp.params)

    # teacher: hidden forward-velocity reference
    hidden = params["rdot_ref"].at[:, 0].set(args.hidden_vx)
    target = fsolve(sol, x0, {**params, "rdot_ref": hidden}).X
    print(f"teacher: hidden rdot_ref_x = {args.hidden_vx}")

    @jax.jit
    def loss(rref):
        out = fsolve(sol, x0, {**params, "rdot_ref": rref})
        return jnp.mean((out.X - target) ** 2)

    gfun = jax.jit(jax.grad(loss))
    rref = params["rdot_ref"]
    l0 = float(loss(rref))
    t0 = time.perf_counter()
    for it in range(args.steps):
        rref = rref - args.lr * gfun(rref)
        if (it + 1) % 10 == 0:
            print(f"  step {it+1:3d}: loss {float(loss(rref)):.3e}")
    dt = time.perf_counter() - t0
    l1 = float(loss(rref))
    vx_rec = float(jnp.mean(rref[1:, 0]))
    print(
        f"recovered rdot_ref_x ≈ {vx_rec:.4f} (hidden {args.hidden_vx}); "
        f"loss {l0:.3e} → {l1:.3e} in {args.steps} steps ({dt:.1f} s)"
    )
    assert l1 < 0.1 * l0, "gradient descent through the solver failed"


if __name__ == "__main__":
    main()
