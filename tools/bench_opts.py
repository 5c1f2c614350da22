"""Generic end-to-end A/B of DDPOptions overrides via warm steady-state
batched MPC ticks — the ONE timing methodology that is trustworthy on the
remote-execution backend (isolated phase timings are memoized/queued
misleadingly; see tools/roofline.py header and CLAUDE.md).

Each variant is a comma-separated list of `field=value` DDPOptions
overrides (values parsed as Python literals). The empty string is the
baseline. Example:

  python tools/bench_opts.py --batch 1024 --reps 10 \
      "" "linearize_fused=True" "rollout_unroll=5" \
      "linearize_fused=True,linearize_precision='bf16'"

Prints ms/tick, solve/s, mean solver iterations, and max defect per
variant (iteration counts must match across result-equivalent variants —
a mismatch means the override changed semantics, not just speed).
"""

import argparse
import ast
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def parse_overrides(spec: str) -> dict:
    out = {}
    for part in filter(None, (p.strip() for p in spec.split(","))):
        key, val = part.split("=", 1)
        out[key.strip()] = ast.literal_eval(val.strip())
    return out


def bench_variant(batch, overrides, reps, base_opts, noise=0.0, chunk=0,
                  ns=None):
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype) if ns is None else SRBDConfig(ns=ns, dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    merged = {**base_opts, **overrides}
    # loop-level (MPCLoop) override, not a DDPOptions field
    shift_ws = bool(merged.pop("shift_warmstart", False))
    solver = MSDDP(prob.ocp, DDPOptions(**merged))
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants,
                   shift_warmstart=shift_ws)

    B = batch
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    if noise:
        # heterogeneous fleet (bench.py's canonical workload): members at
        # different states converge at different iterations, exercising
        # the line-search fan/convergence paths a homogeneous fleet never
        # touches
        x0 = x0 + noise * jax.random.normal(jax.random.key(0), x0.shape,
                                            dtype)
    carries = jax.vmap(loop.init)(x0)
    tick = loop.tick_batch
    if chunk:
        from srbd_horizon_tpu.runtime.chunked import chunk_map

        tick = chunk_map(tick, chunk)
    vtick = jax.jit(tick)
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
    label = ",".join(f"{k}={v}" for k, v in overrides.items()) or "baseline"
    if chunk:
        label += f" [chunk={chunk}]"
    print(
        f"{label:55s} {dt_tick*1e3:8.2f} ms/tick {B/dt_tick:9.0f} solve/s"
        f"  iters_mean={iters:.2f}  max_defect={md:.2e}",
        flush=True,
    )
    return dt_tick


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+",
                    help="DDPOptions overrides, e.g. 'linearize_fused=True'")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="x0 perturbation stddev (0.005 = bench.py fleet)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="cache-blocked execution: tick the fleet in "
                         "N-member chunks (runtime.chunked.chunk_map)")
    ap.add_argument("--ns", type=int, default=None,
                    help="horizon length override (default: config ns=20) "
                         "— for the horizon-scaling study")
    args = ap.parse_args()
    base = dict(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3)
    print(f"device={jax.devices()[0]} batch={args.batch} "
          f"noise={args.noise} chunk={args.chunk} ns={args.ns} base={base}")
    for spec in args.variants:
        bench_variant(args.batch, parse_overrides(spec), args.reps, base,
                      noise=args.noise, chunk=args.chunk, ns=args.ns)


if __name__ == "__main__":
    main()
