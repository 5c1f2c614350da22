"""Roofline / MFU analysis of the MS-DDP tick phases on the current
backend (VERDICT round-1 item 1: quantify whether the solver is
hardware-bound or one optimization away from the next tier).

Methodology notes (hard-won):
  - Device ceilings are measured with DATA-DEPENDENT chained loops
    (lax.fori_loop with output feeding input) — independent repeated
    calls of identical pure computations measured impossible numbers
    (2694 "TFLOP/s" f32 matmul) on the remote-execution backend, i.e.
    some layer memoizes identical dispatches. Chaining defeats that and
    also amortizes dispatch latency.
  - FLOP counts are ANALYTIC (derived from the algebra in
    msddp._backward_lanemajor etc.); XLA's compiled.cost_analysis()
    undercounts fused broadcast-reduce contractions ~20x on TPU.
  - HBM-traffic lower bound = sizeof(kernel inputs + outputs); the true
    traffic includes fusion-boundary intermediates, so 'memory floor' is
    optimistic and 'compute floor' uses the lane-major contraction
    ceiling measured on THIS op shape, not a dense-matmul peak.

Usage: python tools/roofline.py [batch] [reps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out):
    """Force completion via a host read (block_until_ready does not
    actually wait on the remote-execution backend)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _drain(out)   # serial queue: draining the last call drains them all
    return (time.perf_counter() - t0) / reps


def timeit_feedback(fn, x, *rest, reps=5):
    """Time fn with (a) its first output fed back as its first input and
    (b) a host scalar read inside the timed loop. Both are required on
    the remote-execution backend: block_until_ready does NOT actually
    wait there (a 550-GFLOP call 'returns' in 0.05 ms and the work drains
    at the next host read), so only a host read yields a true time; the
    feedback chain stops any call-level result caching."""
    x = fn(x, *rest)
    float(jnp.sum(x))          # drain the queue before starting the clock
    t0 = time.perf_counter()
    for _ in range(reps):
        x = fn(x, *rest)
        float(jnp.sum(x))      # force full drain each rep
    return (time.perf_counter() - t0) / reps


def tree_bytes(tree):
    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(tree)
        if hasattr(a, "size")
    )


def device_ceilings(B=1024, nx=37, dtype=jnp.float32, reps=5):
    """Measured, memoization-proof ceilings via chained loops.

    Each per-rep host read costs one tunnel round trip on the remote
    backend, so (a) the chains are long enough that compute dominates the
    RTT and (b) the RTT floor — measured on a trivial chain — is
    subtracted from every per-call time. The result is a lower bound on
    the true ceiling that tightens as iters grows."""
    from srbd_horizon_tpu.math.linalg import lm_matmul

    # (operands passed as ARGUMENTS, never closed over — closure arrays
    # get baked into the HLO as constants and blow up the remote-compile
    # request body)

    # round-trip floor: a near-free feedback chain
    z0 = jnp.zeros((8,), dtype)
    t_rtt = timeit_feedback(jax.jit(lambda z: z * 1.000001 + 1e-9), z0,
                            reps=reps)

    # MXU f32: chained 2048^2 matmuls
    n, mm_iters = 2048, 64
    a0 = jax.random.normal(jax.random.key(0), (n, n), dtype) / n

    def mm_chain(a, w):
        def body(_, x):
            return 0.999 * (x @ w)
        return jax.lax.fori_loop(0, mm_iters, body, a)

    with jax.default_matmul_precision("highest"):
        t = timeit_feedback(jax.jit(mm_chain), a0, a0, reps=reps)
    t = max(t - t_rtt, 1e-9)
    mxu_f32 = mm_iters * 2 * n**3 / t / 1e12

    # VPU lane-major contraction ceiling on OUR op shape: chained
    # (nx,nx,B) x (nx,nx,B) batched matmuls (batch on lanes)
    lm_iters = 512
    M0 = jax.random.normal(jax.random.key(1), (nx, nx, B), dtype) / nx

    def lm_chain(M, W):
        def body(_, x):
            return 0.999 * lm_matmul(x, W)
        return jax.lax.fori_loop(0, lm_iters, body, M)

    with jax.default_matmul_precision("highest"):
        t = timeit_feedback(jax.jit(lm_chain), M0, M0, reps=reps)
    t = max(t - t_rtt, 1e-9)
    vpu_lm = lm_iters * 2 * nx**3 * B / t / 1e12

    # HBM stream: chained elementwise add over 2^26 elems (each loop
    # iteration is its own kernel: read x, read y, write y = 12 B/elem)
    m, st_iters = 1 << 26, 128
    x = jax.random.normal(jax.random.key(2), (m,), dtype)

    def stream_chain(y, xx):
        def body(_, yy):
            return xx * 0.999 + yy
        return jax.lax.fori_loop(0, st_iters, body, y)

    t = timeit_feedback(jax.jit(stream_chain), x, x, reps=reps)
    t = max(t - t_rtt, 1e-9)
    hbm = st_iters * 3 * 4 * m / t / 1e9

    print(f"rtt floor {t_rtt*1e3:.2f} ms")
    print(f"measured ceilings (chained, rtt-corrected): "
          f"MXU f32 {mxu_f32:.1f} TFLOP/s, "
          f"lane-major contraction {vpu_lm:.3f} TFLOP/s, "
          f"HBM stream {hbm:.0f} GB/s")
    return mxu_f32, vpu_lm, hbm


def backward_flops(nx, nu, nr, ns, B):
    """Analytic FLOPs of one DENSE lane-major backward sweep (the "split"
    algebra in msddp._backward_lanemajor, 2 FLOP per multiply-add)."""
    per_node = 0
    # GN quadratics lx, lu, lxx, luu, lux
    per_node += 2 * nr * (nx + nu)                    # lx, lu
    per_node += 2 * nr * (nx * nx + nu * nu + nu * nx)  # lxx, luu, lux
    # chain
    per_node += 2 * nx * nx + nx                      # Vx_d
    per_node += 2 * nx * nx + 2 * nx * nu             # Qx, Qu
    per_node += 2 * nx**3 + 2 * nx * nx * nu          # VA, VB
    per_node += 2 * nx**3                             # Qxx = A'VA
    per_node += 2 * nx * nu * nu                      # Quu = B'VB
    per_node += 2 * nu * nx * nx                      # Qux = B'VA
    per_node += 4 * nu**3                             # block-Schur inverse
    per_node += 2 * nu * nu + 2 * nu * nu * nx        # k, K
    per_node += 2 * nu * nu + 2 * nx * nu * nu        # Quu_k, KQuu
    per_node += 6 * nx * nu                           # Vx_new terms
    per_node += 3 * 2 * nx * nu * nx + 2 * nx * nx    # Vxx_new terms
    return per_node * ns * B


def backward_flops_blocksparse(nx, nu, ns, B, rx, ru, gx, gu, nb):
    """Analytic FLOPs of one BLOCKSPARSE lane-major backward sweep (the
    default path since round 2; algebra in msddp._backward_lanemajor's
    blocksparse node). rx/ru = live rows of A−I / B; gx/gu = live residual
    rows wrt x/u; nb = |gx ∩ gu| (rows live in both, the lux Gram)."""
    per_node = 0
    # GN quadratics over live rows only
    per_node += 2 * gx * nx + 2 * gu * nu                 # lx, lu
    per_node += 2 * gx * nx * nx + 2 * gu * nu * nu      # lxx, luu
    per_node += 2 * nb * nu * nx                          # lux
    # chain with A = I + S (S: rx live rows), B (ru live rows)
    per_node += 2 * nx * nx + nx                          # Vx_d
    per_node += 2 * rx * nx + 2 * ru * nu                # Qx, Qu
    per_node += 2 * nx * rx * nx                          # VA correction
    per_node += 2 * rx * nx * nx                          # Qxx = VA + S'VA[rx]
    per_node += 2 * ru * ru * nu + 2 * ru * nu * nu      # Quu = B'(V_uu B)
    per_node += 2 * ru * nu * nx                          # Qux = B'VA[ru]
    # Schur-form value recursion (Quu k = −Qu collapse)
    per_node += 4 * nu**3                                 # block-Schur inverse
    per_node += 2 * nu * nu + 2 * nu * nu * nx           # k, K
    per_node += 2 * nu * nx + 2 * nx * nu * nx           # Vx_new, Vxx_new
    return per_node * ns * B


def linearize_flops(nx, nu, nr, ns, B, dyn_ops=2500, res_ops=1500):
    """jacfwd pushes (nx+nu) tangents through dynamics+residual; ops
    estimates are per-evaluation scalar-op counts of the SRBD model."""
    return (nx + nu + 1) * (dyn_ops + res_ops) * ns * B * 2


def main(batch=1024, reps=20):
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
    nx, nu, ns = prob.ocp.nx, prob.ocp.nu, prob.ocp.ns

    print(f"device={jax.devices()[0]} batch={B} nx={nx} nu={nu} ns={ns}")
    mxu, vpu_lm, hbm = device_ceilings(B=B, nx=nx, dtype=dtype)

    with jax.default_matmul_precision("highest"):
        lin_fn = jax.jit(jax.vmap(solver._linearize))
        lin = lin_fn(X, U, params)
        nr = lin["rho"].shape[-1]
        mu = jnp.asarray(1e-6, dtype)

        bwd_fn = jax.jit(lambda l: solver._backward_lanemajor(l, mu))
        bwd_out = bwd_fn(lin)
        t_lin = timeit(lin_fn, X, U, params, reps=reps)
        t_bwd = timeit(bwd_fn, lin, reps=reps)

        ks, Ks, dV1, dV2 = bwd_out
        roll_fn = jax.jit(jax.vmap(
            lambda x0_, X_, U_, k_, K_, d_, p_: solver._rollout(
                x0_, X_, U_, k_, K_, d_, p_, jnp.asarray(1.0, dtype)
            )
        ))
        roll_out = roll_fn(x0, X, U, ks, Ks, lin["d"], params)
        t_roll = timeit(roll_fn, x0, X, U, ks, Ks, lin["d"], params, reps=reps)

        cost_fn = jax.jit(jax.vmap(solver.total_cost))
        t_cost = timeit(cost_fn, X, U, params, reps=reps)

        solveb_fn = jax.jit(solver.solve_batch)
        _ = solveb_fn(sols, x0, params)
        t_solveb = timeit(solveb_fn, sols, x0, params, reps=max(3, reps // 4))

    print(f"nr (stage residual rows) = {nr}")

    # ---- backward ----
    ocp = prob.ocp
    if (
        solver.opts.backward_contract == "blocksparse"
        and ocp.dynamics_x_rows is not None
    ):
        f_bwd = backward_flops_blocksparse(
            nx, nu, ns, B,
            rx=len(ocp.dynamics_x_rows), ru=len(ocp.dynamics_u_rows),
            gx=len(ocp.residual_x_rows), gu=len(ocp.residual_u_rows),
            nb=len(set(ocp.residual_x_rows) & set(ocp.residual_u_rows)),
        )
    else:
        f_bwd = backward_flops(nx, nu, nr, ns, B)
    io_bwd = tree_bytes(lin) + tree_bytes(bwd_out)
    t_comp = f_bwd / (vpu_lm * 1e12)
    t_mem = io_bwd / (hbm * 1e9)
    print(f"\nbackward (lm): {t_bwd*1e3:7.2f} ms | {f_bwd/1e9:6.2f} GFLOP "
          f"-> {f_bwd/t_bwd/1e12:6.3f} TFLOP/s "
          f"({100*f_bwd/t_bwd/(vpu_lm*1e12):5.1f}% of lane-major ceiling)")
    print(f"  floors: compute {t_comp*1e3:6.2f} ms, io-lower-bound "
          f"{t_mem*1e3:6.2f} ms -> headroom {t_bwd/max(t_comp,t_mem):4.1f}x")

    # ---- linearize ----
    f_lin = linearize_flops(nx, nu, nr, ns, B)
    io_lin = tree_bytes((X, U, params)) + tree_bytes(lin)
    print(f"linearize:     {t_lin*1e3:7.2f} ms | ~{f_lin/1e9:6.2f} GFLOP "
          f"(estimate) | io {io_lin/1e6:6.1f} MB -> "
          f"io floor {io_lin/(hbm*1e9)*1e3:5.2f} ms")

    # ---- rollout / cost (scan-latency-bound, tiny FLOPs) ----
    io_roll = tree_bytes((x0, X, U, ks, Ks)) + tree_bytes(roll_out)
    print(f"rollout:       {t_roll*1e3:7.2f} ms | io {io_roll/1e6:6.1f} MB "
          f"({ns}-step sequential scan -> {t_roll/ns*1e6:5.0f} us/step)")
    print(f"cost:          {t_cost*1e3:7.2f} ms")
    print(f"solve_batch:   {t_solveb*1e3:7.2f} ms (max_iters=5)")

    iter_est = t_lin + t_bwd + t_roll + t_cost
    print(f"\nper-iteration fast path: {iter_est*1e3:6.2f} ms "
          f"(lin {100*t_lin/iter_est:.0f}% bwd {100*t_bwd/iter_est:.0f}% "
          f"roll {100*t_roll/iter_est:.0f}% cost {100*t_cost/iter_est:.0f}%)")
    # sanity: the full solve runs max_iters of all phases — if the isolated
    # phase sum exceeds it, the isolated timings are artifacts of the
    # remote-execution path (caching/queuing), not real device times; only
    # the end-to-end A/B tools are decisive then (tools/bench_opts.py)
    if iter_est * solver.opts.max_iters > 1.5 * t_solveb:
        print(f"WARNING: phase-sum x{solver.opts.max_iters} = "
              f"{iter_est*solver.opts.max_iters*1e3:.1f} ms >> solve_batch "
              f"{t_solveb*1e3:.1f} ms -> isolated phase timings are NOT "
              f"trustworthy on this backend; use end-to-end A/B instead")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(b, r)
