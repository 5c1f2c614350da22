"""Transcription-path benchmark — the TranscribedNLP (full-space AL
Gauss-Newton, the IPOPT-role solver) measured against the hot-path
solvers on the SAME OCPs, so a user choosing `transcription_method`
(reference prb.py:111-113, isrbd_example.py:131-138) knows the cost.

Workloads (cold batched solves — the offline/seeding role this solver
plays, reference isrbd_example.py:361-369):
  - LIP OCP:   TranscribedNLP (multiple_shooting + direct_collocation)
               vs MS-DDP on the identical problem
  - isrbd OCP: TranscribedNLP (multiple_shooting) vs ALDDP (the
               serving-stack AL over batched inner DDP)

Prints one JSON line with solve/s, mean inner GN iterations, and final
max violation per solver. Expected outcome (and why it's still worth
recording): the full-space GN pays an O(nz³) dense factorization per
iteration vs the DDP solvers' O(ns·nx³) Riccati sweeps — it loses at
scale but is the capability-parity surface for direct transcription.

Usage: python tools/bench_collocation.py [batch] [reps] [--cpu]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, reps, drain):
    out = fn()
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    drain(out)
    return (time.perf_counter() - t0) / reps, out


def bench_lip(batch, reps):
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.lip import build_lip_problem
    from srbd_horizon_tpu.solvers.alddp import ALOptions
    from srbd_horizon_tpu.solvers.collocation import (
        GNOptions, TranscribedNLP,
    )
    from srbd_horizon_tpu.solvers.msddp import MSDDP

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_lip_problem(cfg, kangaroo_line_feet())
    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(jax.random.key(3), x0.shape, dtype)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    params["rdot_ref"] = params["rdot_ref"].at[:, :, 0].set(0.1)

    out = {}
    for trans in ("multiple_shooting", "direct_collocation"):
        nlp = TranscribedNLP(
            prob.ocp, transcription=trans,
            gn_opts=GNOptions(max_iters=25),
            al_opts=ALOptions(outer_iters=6, rho0=1e3, rho_max=1e5,
                              tol=1e-6),
        )
        sts0 = jax.vmap(nlp.init)(x0)
        solve = jax.jit(lambda: jax.vmap(nlp.solve)(sts0, x0, params))
        dt, st = _time(solve, reps, lambda s: float(jnp.sum(s.viol)))
        out[trans] = {
            "solves_per_s": round(B / dt, 1),
            "solve_ms": round(dt * 1e3 / B, 3),
            "max_viol": float(jnp.max(st.viol)),
            "finite": bool(jnp.all(jnp.isfinite(st.z))),
        }

    ddp = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=30, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    sols0 = jax.vmap(ddp.init)(x0)
    solve = jax.jit(lambda: ddp.solve_batch(sols0, x0, params))
    dt, sol = _time(solve, reps, lambda s: float(jnp.sum(s.cost)))
    out["msddp_baseline"] = {
        "solves_per_s": round(B / dt, 1),
        "solve_ms": round(dt * 1e3 / B, 3),
        "max_defect": float(jnp.max(sol.defect_norm)),
        "iters_mean": float(jnp.mean(sol.iterations)),
        "finite": bool(jnp.all(jnp.isfinite(sol.X))),
    }
    return out


def bench_isrbd(batch, reps):
    from srbd_horizon_tpu.config import SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP
    from srbd_horizon_tpu.solvers.collocation import (
        GNOptions, TranscribedNLP,
    )
    from srbd_horizon_tpu.solvers.options import al_serving_options

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet())
    B = batch
    ns = prob.ocp.ns
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(jax.random.key(7), x0.shape, dtype)
    U0 = jnp.tile(prob.static_input[None], (ns, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )

    out = {}
    ddp_al, al_opts = al_serving_options(max_iters=15)
    nlp = TranscribedNLP(
        prob.ocp, transcription="multiple_shooting",
        gn_opts=GNOptions(max_iters=15),
        al_opts=al_opts,
    )
    sts0 = jax.vmap(lambda x: nlp.init(x, U0=U0))(x0)
    solve = jax.jit(lambda: jax.vmap(nlp.solve)(sts0, x0, params))
    dt, st = _time(solve, reps, lambda s: float(jnp.sum(s.viol)))
    out["transcribed_nlp"] = {
        "solves_per_s": round(B / dt, 1),
        "solve_ms": round(dt * 1e3 / B, 3),
        "max_viol": float(jnp.max(st.viol)),
        "finite": bool(jnp.all(jnp.isfinite(st.z))),
    }

    alddp = ALDDP(prob.ocp, ddp_opts=ddp_al, al_opts=al_opts)
    sts0 = jax.vmap(lambda x: alddp.init(x, U0=U0))(x0)
    solve = jax.jit(lambda: alddp.solve_batch(sts0, x0, params))
    dt, st = _time(solve, reps, lambda s: float(jnp.sum(s.viol)))
    out["alddp_baseline"] = {
        "solves_per_s": round(B / dt, 1),
        "solve_ms": round(dt * 1e3 / B, 3),
        "max_viol": float(jnp.max(st.viol)),
        "finite": bool(jnp.all(jnp.isfinite(st.sol.X))),
    }
    return out


def main():
    argv = sys.argv[1:]
    if "--cpu" in argv:
        jax.config.update("jax_platforms", "cpu")
    args = [a for a in argv if not a.startswith("--")]
    batch = int(args[0]) if args else 256
    reps = int(args[1]) if len(args) > 1 else 3
    result = {
        "metric": "transcription_bench",
        "batch": batch,
        "lip": bench_lip(batch, reps),
        "isrbd": bench_isrbd(batch, reps),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
