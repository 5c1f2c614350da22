"""Phase-level microbenchmark of the MS-DDP solver on the current backend.

Times each phase of one DDP iteration separately (jitted, steady-state):
linearize / backward Riccati / forward rollout / cost evaluation — so kernel
optimization is evidence-driven rather than guessed.

Usage: python tools/profile_phases.py [batch] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(batch=512, reps=20):
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.solvers.msddp import MSDDP

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(prob.ocp, DDPOptions(max_iters=5))

    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    sols = jax.vmap(solver.init)(x0)
    X, U = sols.X, sols.U

    with jax.default_matmul_precision("highest"):
        lin_fn = jax.jit(jax.vmap(solver._linearize))
        lin = lin_fn(X, U, params)

        bwd_fn = jax.jit(
            jax.vmap(lambda l: solver._backward(l, jnp.asarray(1e-6, dtype)))
        )
        ks, Ks, dV1, dV2 = bwd_fn(lin)

        roll_fn = jax.jit(
            jax.vmap(
                lambda x0_, X_, U_, k_, K_, d_, p_: solver._rollout(
                    x0_, X_, U_, k_, K_, d_, p_, jnp.asarray(1.0, dtype)
                )
            )
        )
        Xn, Un = roll_fn(x0, X, U, ks, Ks, lin["d"], params)

        cost_fn = jax.jit(jax.vmap(solver.total_cost))
        _ = cost_fn(Xn, Un, params)

        bwd_lm_fn = jax.jit(
            lambda l: solver._backward_lanemajor(l, jnp.asarray(1e-6, dtype))
        )
        _ = bwd_lm_fn(lin)

        # the PRODUCTION path phases (linearize_sliced default): sliced
        # emission + blocksparse lane-major backward consuming it
        lin_sl_fn = jax.jit(jax.vmap(
            lambda x, u, p: solver._linearize(x, u, p, sliced=True)
        ))
        lin_sl = lin_sl_fn(X, U, params)
        bwd_sl_fn = jax.jit(
            lambda l: solver._backward_lanemajor(l, jnp.asarray(1e-6, dtype))
        )
        _ = bwd_sl_fn(lin_sl)

        solve_fn = jax.jit(jax.vmap(solver.solve))
        _ = solve_fn(sols, x0, params)
        solveb_fn = jax.jit(solver.solve_batch)
        _ = solveb_fn(sols, x0, params)

        t_lin = timeit(lin_fn, X, U, params, reps=reps)
        t_lin_sl = timeit(lin_sl_fn, X, U, params, reps=reps)
        t_bwd = timeit(bwd_fn, lin, reps=reps)
        t_bwd_lm = timeit(bwd_lm_fn, lin, reps=reps)
        t_bwd_sl = timeit(bwd_sl_fn, lin_sl, reps=reps)
        t_roll = timeit(roll_fn, x0, X, U, ks, Ks, lin["d"], params, reps=reps)
        t_cost = timeit(cost_fn, Xn, Un, params, reps=reps)
        t_solve = timeit(solve_fn, sols, x0, params, reps=max(3, reps // 4))
        t_solveb = timeit(solveb_fn, sols, x0, params, reps=max(3, reps // 4))

    print(f"device={jax.devices()[0]} batch={B}")
    print(f"linearize    : {t_lin*1e3:8.2f} ms (dense)")
    print(f"linearize sl : {t_lin_sl*1e3:8.2f} ms (sliced — production)")
    print(f"backward     : {t_bwd*1e3:8.2f} ms (vmap batch-first)")
    print(f"backward lm  : {t_bwd_lm*1e3:8.2f} ms (lane-major, dense lin)")
    print(f"backward sl  : {t_bwd_sl*1e3:8.2f} ms (lane-major, sliced lin — production)")
    print(f"rollout      : {t_roll*1e3:8.2f} ms")
    print(f"cost         : {t_cost*1e3:8.2f} ms")
    ls_width = solver.opts.parallel_line_search_width
    iter_est = t_lin_sl + t_bwd_sl + ls_width * (t_roll + t_cost)
    print(f"est/iter(lm) : {iter_est*1e3:8.2f} ms  (ls_width={ls_width})")
    print(f"solve (vmap) : {t_solve*1e3:8.2f} ms  (max_iters={solver.opts.max_iters})")
    print(f"solve (batch): {t_solveb*1e3:8.2f} ms")
    # sanity (see tools/roofline.py / CLAUDE.md): on the remote-execution
    # backend isolated per-phase timings can be wildly wrong (caching /
    # queue effects); when they cannot add up to the end-to-end solve,
    # trust only the end-to-end A/B tools (tools/bench_opts.py)
    if iter_est * solver.opts.max_iters > 1.5 * t_solveb:
        print("WARNING: phase-sum inconsistent with solve_batch -> isolated "
              "phase timings are NOT trustworthy on this backend")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(b, r)
