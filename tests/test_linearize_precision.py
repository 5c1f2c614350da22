"""`linearize_precision="bf16"` — the serving configuration bench.py runs:
stage Jacobians formed in bfloat16, all Riccati/line-search algebra in f32,
residuals/defects recomputed exactly (config.DDPOptions.linearize_precision;
measured +6.6% throughput on TPU, tools/bench_linearize_dtype.py).

Inexact Jacobians act as an inexact-Newton perturbation: accept/reject
decisions use the exact f32 merit, so the failure mode would be extra
iterations or a stalled walk — these tests pin down that neither happens.
"""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, walking_schedule
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _solver(prob, precision, **kw):
    return MSDDP(
        prob.ocp,
        DDPOptions(alpha_converge_threshold=1e-12, beta=1e-3,
                   linearize_precision=precision, **kw),
    )


def test_bf16_linearize_matches_f32_solution():
    """Cold-start batched solves land on the same optimum (the merit is
    exact, so bf16 curvature only perturbs the path, not the fixed point
    beyond Jacobian-rounding scale)."""
    cfg = SRBDConfig(dtype=jnp.float32)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    B = 4
    key = jax.random.key(7)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float32)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    outs = {}
    for prec in ("f32", "bf16"):
        s = _solver(prob, prec, max_iters=10)
        sols = jax.vmap(s.init)(x0)
        outs[prec] = jax.jit(s.solve_batch)(sols, x0, params)
    ref, got = outs["f32"], outs["bf16"]
    assert bool(jnp.all(jnp.isfinite(got.X)))
    np.testing.assert_allclose(
        np.asarray(got.cost), np.asarray(ref.cost), rtol=2e-3
    )
    # the inexact path may take ±1 iteration but not blow the budget
    assert int(np.max(np.asarray(got.iterations))) <= int(
        np.max(np.asarray(ref.iterations))
    ) + 2
    assert float(np.max(np.asarray(got.defect_norm))) < 1e-5


def test_bf16_linearize_walks():
    """Closed-loop SRBD walking (f32, online iteration budget) stays in the
    CoM band and makes forward progress with bf16-formed Jacobians — the
    bench.py serving config exercised end-to-end."""
    cfg = SRBDConfig(dtype=jnp.float32)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = _solver(prob, "bf16", max_iters=5)
    wpg = WalkingPatternGenerator.build(
        c_init_z=float(prob.initial_foot_position[0, 2]),
        nodes=cfg.ns,
        dtype=jnp.float32,
    )
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants)
    carry = loop.init(prob.initial_state)
    T = 60
    sched = walking_schedule(T, vx=0.3, start=10, dtype=jnp.float32)
    carry, out = jax.jit(loop.run)(carry, sched)
    X = np.asarray(out.x)
    assert np.all(np.isfinite(X))
    r = X[:, 0:3]
    assert np.all(np.abs(r[:, 2] - float(prob.com[2])) < 0.08), r[:, 2]
    assert r[-1, 0] > 0.25, f"final CoM x = {r[-1, 0]}"
    assert float(np.max(out.defect_norm)) < 1e-3
