"""Benchmark: batched SRBD MPC throughput + real-time latency on the
available accelerator.

Prints ONE JSON line:
  {"metric": "srbd_mpc_solves_per_s", "value": N, "unit": "solve/s",
   "vs_baseline": N / 10.0,
   "p50_ms": ..., "p99_ms": ..., "realtime_batch": 512, "realtime_ok": ...,
   "throughput": {...}, ...}

Baseline semantics: the reference publishes no numbers (BASELINE.md); its
only implicit performance fact is the 10 Hz real-time replanning budget of a
single serial solver instance (dsrbd_example.py:48) ⇒ baseline = 10 solves/s.
`vs_baseline` is therefore (batched solves/s) / 10.

Three operating points, all measured (BASELINE.md target table):
  - THROUGHPUT (headline `value`): B=4096, maximize solves/s.
  - LATENCY: B=512, per-tick p50/p99 vs the 100 ms replanning budget
    (dsrbd_example.py:48: hz=10); `realtime_ok` gates on the e2e p50
    AND the device-side p99 (each e2e sample pays one tunnel RTT and
    network spikes land in the e2e p99, so that one is reported but
    not gated — see the inline comment at the realtime_ok field).
  - CONSTRAINED (`constrained` field): the full-NLP isrbd AL-serving
    fleet (tools/bench_isrbd.py) at its sweet-spot batch B=256 — the
    reference's IPOPT/gnsqp workload — under the round-5 serving config
    (gait-phase multiplier tables + stiff cz rows, one outer/tick);
    `constrained_at_scale` repeats it at B=4096 with cache-blocked
    execution (chunk=256), which holds the sweet-spot rate at 16× the
    fleet.
  - SHARDED (`sharded` field): the serving tick under shard_map on the
    available mesh (tools/bench_sharded.py) — 1-device overhead gate /
    N-device scaling efficiency.

The measured unit of work is one full warm-started MPC tick of the
dsrbd_example.py loop (reference-shift + WPG advance + MS-DDP solve with the
online iteration budget + Euler self-simulation), vmapped over a scenario
batch — i.e. end-to-end replans/s, not just inner-loop FLOPs.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out) -> None:
    """Force true completion: on the remote-execution backend
    `block_until_ready` returns before the work drains — only a host read
    of a value is a real barrier."""
    float(jnp.sum(out.defect_norm))


def _measure(batch: int, n_ticks: int, ns: int, max_iters: int,
             per_tick_sync: bool = True, chunk: int = 0):
    """Run one operating point; returns per-tick wall times + health stats.

    per_tick_sync=True  — host-read after every tick: each sample is a true
                          end-to-end tick latency (including one device→host
                          readback, as a deployed controller would pay).
    per_tick_sync=False — dispatch the whole run and host-read once at the
                          end: pipelined steady-state throughput.
    chunk>0             — cache-blocked execution (runtime.chunked.chunk_map):
                          the tick runs in chunk-member slices so the
                          per-member working set stays cache-resident at any
                          fleet size (round 4: B=4096 at chunk 512 runs the
                          unconstrained fleet at 17.3k vs 15.9k unchunked)."""
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(ns=ns, dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    # online MPC iteration budget: the reference caps online solves at 5
    # iterations (launch/SRBD_kangaroo_line_feet.launch:20)
    # Serving configuration: plain f32 with the (default) sliced
    # linearization. bf16 Jacobian formation was the serving config while
    # dense Jacobians made linearize bandwidth-bound (+6.6%,
    # tools/bench_linearize_dtype.py); with linearize_sliced the dead
    # rows are never materialized and f32 is FASTER than bf16 formation
    # (11986 vs 11344 solve/s at B=4096 — tools/bench_opts.py, round 2c).
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=max_iters, alpha_converge_threshold=1e-12,
                   beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(c_init_z=0.0, nodes=cfg.ns, dtype=dtype)
    # shift_warmstart: serving config — roll the plan one node forward
    # each tick so the warm start matches the shifted parameters
    # (iters_mean 4.44 → 3.78; wall-clock gain comes via the active-set
    # compaction defaults; BENCH_NOTES.md round 3). The solve itself
    # keeps the reference's online budget (max_iters, launch:20).
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants,
                   shift_warmstart=True)

    B = batch
    key = jax.random.key(0)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.005 * jax.random.normal(key, x0.shape, dtype)
    carries = jax.vmap(loop.init)(x0)

    # donate the carry: the previous tick's plan/params buffers are dead
    # after each call — donation avoids a device-side copy of ~10 MB/tick
    tick_fn = loop.tick_batch
    if chunk:
        from srbd_horizon_tpu.runtime.chunked import chunk_map

        tick_fn = chunk_map(tick_fn, chunk)
    vtick = jax.jit(tick_fn, donate_argnums=(0,))

    # the command stream is t-invariant here (constant walk command), so
    # build it ONCE and keep it device-resident — re-creating the arrays
    # every tick re-uploads them through the host each call. Pipelined
    # throughput is unaffected (uploads overlap dispatch) but the
    # per-tick-sync latency samples each paid the transfers: hoisting
    # took the B=256 point from p50 61.4/p99 109 ms to p50 55/p99 63 ms
    # (the p99 "spikes" were upload round-trips, not solver variance).
    inp = TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0], dtype)[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), dtype),
    )
    inp = jax.device_put(inp)

    # warmup: compile + 3 ticks to reach warm-started steady state
    carries, out = vtick(carries, inp)
    carries, out = vtick(carries, inp)
    carries, out = vtick(carries, inp)
    _drain(out)

    if per_tick_sync:
        times = []
        for t in range(n_ticks):
            t0 = time.perf_counter()
            carries, out = vtick(carries, inp)
            _drain(out)
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)
    else:
        t0 = time.perf_counter()
        for t in range(n_ticks):
            carries, out = vtick(carries, inp)
        _drain(out)
        times = np.full(n_ticks, (time.perf_counter() - t0) / n_ticks)

    finite = bool(np.all(np.isfinite(np.asarray(out.x))))
    max_defect = float(np.max(np.asarray(out.defect_norm)))
    iters_mean = float(np.mean(np.asarray(out.iterations)))

    device_stats = None
    if per_tick_sync:
        # DEVICE-side latency decomposition: every per-tick-sync sample
        # above includes one host↔device round-trip (on axon: tunnel
        # RTT, 26-44 ms run-to-run — it dominates and its jitter is
        # indistinguishable from solver regressions). Estimate the pure
        # on-device tick time by paired window differencing: time a
        # chained dispatch of W2 ticks and of W1 ticks (each pays the
        # same single readback), difference them — the RTT and readback
        # cancel, leaving (W2-W1) device ticks. Percentiles over the
        # paired samples.
        w1, w2, reps = 2, 8, 12
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(w1):
                carries, out = vtick(carries, inp)
            _drain(out)
            t1 = time.perf_counter()
            for _ in range(w2):
                carries, out = vtick(carries, inp)
            _drain(out)
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / (w2 - w1))
        d = np.asarray(diffs) * 1e3
        device_stats = {
            "device_p50_ms": round(float(np.percentile(d, 50)), 2),
            "device_p99_ms": round(float(np.percentile(d, 99)), 2),
        }
    return times, finite, max_defect, iters_mean, device_stats


def _rtt_ms() -> float:
    """Per-call dispatch+readback floor of the backend (on the axon tunnel
    this is network round-trip, not device time) — reported so the latency
    percentiles are interpretable."""
    f = jax.jit(lambda z: z * 1.000001 + 1e-9)
    z = jnp.zeros((8,), jnp.float32)
    z = f(z)
    float(jnp.sum(z))
    t0 = time.perf_counter()
    for _ in range(10):
        z = f(z)
        float(jnp.sum(z))
    return (time.perf_counter() - t0) / 10 * 1e3


def main(batch: int = 4096, n_ticks: int = 10, ns: int = 20,
         max_iters: int = 5, realtime_batch: int = 512) -> None:
    # LATENCY operating point: B=512, per-tick p50/p99 vs the 100 ms
    # budget; 100 ticks so the p99 is a statistic, not the sample max.
    # 512 is the largest power-of-two fleet that clears the budget:
    # measured p50 64.1 / p99 67.8 ms (B=256: p50 44.4 / p99 50.1; B=1024
    # at ~253 ms/tick is far past it — BENCH_NOTES.md batch scaling)
    lat_times, lat_finite, lat_defect, lat_iters, device_stats = _measure(
        realtime_batch, max(100, n_ticks), ns, max_iters
    )
    p50_ms = float(np.percentile(lat_times, 50) * 1e3)
    p99_ms = float(np.percentile(lat_times, 99) * 1e3)

    # THROUGHPUT operating point: the headline number — pipelined
    # steady-state ticks (dispatch chained, one host read at the end),
    # the way a serving fleet actually runs. Cache-blocked at the
    # measured chunk knee (512): past it the per-member working set
    # streams through HBM (round 4: 17.3k vs 15.9k solve/s at B=4096;
    # chunk 1024 ≈ unchunked, chunk 256 pathological — see BENCH_NOTES).
    thr_chunk = 512 if batch > 512 else 0
    thr_times, finite, max_defect, iters_mean, _ = _measure(
        batch, max(20, n_ticks), ns, max_iters, per_tick_sync=False,
        chunk=thr_chunk,
    )
    elapsed = float(np.sum(thr_times))
    ticks_per_s = len(thr_times) / elapsed
    solves_per_s = ticks_per_s * batch

    result = {
        "metric": "srbd_mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solve/s",
        "vs_baseline": round(solves_per_s / 10.0, 1),
        "batch": batch,
        "ns": ns,
        "max_iters": max_iters,
        "chunk": thr_chunk,
        "tick_latency_ms": round(1e3 / ticks_per_s, 2),
        "finite": finite and lat_finite,
        "max_defect": max(max_defect, lat_defect),
        "solver_iters_mean": round(iters_mean, 2),
        # real-time operating point, gated on BASELINE.md's criterion
        # (100 ms replanning budget) applied to BOTH the e2e p50 and the
        # device-side p99. The e2e p99 is reported for attribution but
        # not gated: each latency sample pays one tunnel round-trip
        # (rtt_ms) and occasional multi-RTT network spikes land in it —
        # run-to-run it swings 86–150 ms while p50 is stable; an on-host
        # deployment pays neither. The DEVICE p99 (paired-window
        # differencing, RTT cancels) has no such excuse: a genuine
        # on-device tail regression must fail the gate.
        "realtime_batch": realtime_batch,
        "p50_ms": round(p50_ms, 2),
        "p99_ms": round(p99_ms, 2),
        # pure on-device tick time (paired window differencing — RTT and
        # readback cancel): the solver's own latency, so an e2e p99 swing
        # with a stable device_p99 is attributable to the tunnel, not a
        # solver regression
        **(device_stats or {}),
        "realtime_ok": bool(
            p50_ms <= 100.0
            and (device_stats is None
                 or device_stats["device_p99_ms"] <= 100.0)
        ),
        "realtime_solves_per_s": round(realtime_batch * 1e3 / p50_ms, 1),
        # backend dispatch+readback floor (tunnel RTT, included in every
        # latency sample above; an on-host deployment would not pay it)
        "rtt_ms": round(_rtt_ms(), 2),
        "device": str(jax.devices()[0]),
    }
    # sanity: a warm MPC tick must actually iterate the solver
    result["suspect"] = bool(iters_mean < 0.5 or not result["finite"])

    # CONSTRAINED operating point (the reference's IPOPT/gnsqp isrbd
    # workload at fleet scale): full-NLP AL serving at its measured
    # sweet-spot batch (BENCH_NOTES.md round 2e). Guarded so a failure
    # here can never break the headline metric.
    try:
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from tools.bench_isrbd import measure as _constrained_measure

        # Round-5 serving config: shifted warm starts + full-field
        # gait-phase multiplier tables (ALDDP.FullPhasePrior — λ*(node,
        # phase) learned across cycles) + stiff contact-height rows
        # (cz_rho_weight=3200; the table-seeded λ removes the
        # multiplier-windup ceiling that capped it at 400) + ONE
        # single-inner-iteration outer per tick. Half the outer cost of
        # the round-4 2-outer config at comparable feasibility
        # (BENCH_NOTES.md round 5; the r4 config measured 18.2k at
        # 9.5e-4, r5 measured ~33k at ~1.3e-3 window).
        result["constrained"] = _constrained_measure(
            batch=256, n_ticks=20, shift=True, online_iters=1, outers=1,
            prior="full", cz_w=3200.0,
        )
        # the same workload at 16× the fleet, cache-blocked to the
        # sweet-spot chunk (runtime.chunked.chunk_map — BENCH_NOTES.md
        # round 3: holds the B=256 rate at any fleet size)
        result["constrained_at_scale"] = _constrained_measure(
            batch=4096, n_ticks=10, chunk=256, shift=True,
            online_iters=1, outers=1, prior="full", cz_w=3200.0,
        )
    except Exception as e:  # pragma: no cover - defensive
        result["constrained"] = {"error": str(e)[:200]}

    # SHARDED operating point (pod-ready scaling artifact): the same
    # serving tick through parallel.mesh.sharded_batched_tick on
    # whatever mesh exists. On the 1-real-chip backend this measures
    # the pure shard_map dispatch overhead (gated ≤2% in the tool —
    # "sharding is free" shown, not assumed); on an N-chip slice the
    # same code reports per-device rate + scaling efficiency.
    try:
        from tools.bench_sharded import measure_unconstrained as _sharded

        result["sharded"] = _sharded(1024, 10)
    except Exception as e:  # pragma: no cover - defensive
        result["sharded"] = {"error": str(e)[:200]}

    print(json.dumps(result))


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    main(batch=batch)
