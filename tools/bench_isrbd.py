"""Constrained (full-NLP / AL) fleet-serving benchmark — batched online
isrbd ticks at float32, the workload the reference runs one robot at a
time through IPOPT/gnsqp (isrbd_example.py:401-477).

Each tick is one frozen-penalty AL outer iteration over the whole fleet
(ALDDP.solve_online_batch: batched inner MS-DDP solve + multiplier
update), with the gait schedule advanced device-side (WPG shift) —
the same warm-started online pattern as examples/isrbd_example.py but
over B fleet members at once. Requires the f32 serving configuration
(solvers/options.py::al_serving_options: scaled equality stack,
ρ ≤ 1e5); without eq_scale this workload diverges in f32.

Prints one JSON line: ticks/s × B = constrained solves/s, plus the
fleet max violation trace endpoints (sanity: bounded, not drifting).
Chained-dispatch timing (one device sync after N ticks): a throughput
number, not a per-tick latency. Measured sweet spot is SMALL batch
(B=256) — the hybrid-dynamics + multiplier working set falls out of
cache past B≈512 (BENCH_NOTES.md round 2e).

Usage: python tools/bench_isrbd.py [batch] [ticks] [--dense] [--no-ucols]
                                   [--sync]
  --dense     strip the OCP's sparsity metadata (A/B baseline: dense inner
              linearize + dense backward contraction)
  --no-ucols  strip only dynamics_u_cols (isolates the input-column
              sparsity win: forces are dead B columns in the isrbd
              double-integrator dynamics)
  --sync      per-tick device sync: reports p50/p99 tick latency (the
              real-time number) instead of chained-dispatch throughput
  --chunk N   cache-blocked execution: run the fleet tick in N-member
              chunks via runtime.chunked.chunk_map (restores the
              small-batch cache-resident rate at large B)
  --prior [tail|full]
              gait-phase-indexed AL multiplier priors. "tail"
              (ALDDP.PhasePrior) seeds only the freshly injected tail
              multipliers from per-phase EMA tables; "full"
              (ALDDP.FullPhasePrior) replaces the whole equality-
              multiplier field — each (node, phase) entry converges
              across gait cycles. The warmup runs one extra gait cycle
              to populate the tables.
  --smooth-swing
              beyond-reference swing profile (WPG swing_profile=
              "smooth"): the 0.1 sin apex spread over the actual
              single-support nodes instead of the reference's
              linspace-50 head — removes the 5 cm one-node touchdown
              cliff that sets the closed-loop serving floor
  --czw W     contact-height (cz) AL stiffness override
              (build_isrbd_problem cz_rho_weight; default 400 — the
              round-4 windup-safe value; the round-5 prior configs run
              1600-3200, see problems/isrbd.py)
  --cpu       force the CPU backend (fast local A/Bs)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def measure(batch: int = 1024, n_ticks: int = 30, dense: bool = False,
            no_ucols: bool = False, sync: bool = False,
            chunk: int = 0, shift: bool = False,
            online_iters: int = 5, outers: int = 1,
            prior: str = "", cz_w: float = 400.0,
            smooth_swing: bool = False) -> dict:
    """Run the constrained fleet benchmark; returns the result dict
    (importable — bench.py embeds this as its `constrained` field)."""
    from srbd_horizon_tpu.config import SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP
    from srbd_horizon_tpu.solvers.options import al_serving_options
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet(),
                               cz_rho_weight=cz_w)
    if dense:
        import dataclasses

        prob = dataclasses.replace(
            prob,
            ocp=dataclasses.replace(
                prob.ocp,
                residual_x_rows=None, residual_u_rows=None,
                dynamics_x_rows=None, dynamics_u_rows=None,
                dynamics_u_cols=None,
                ineq_x_rows=None, ineq_u_rows=None,
            ),
        )
    elif no_ucols:
        import dataclasses

        prob = dataclasses.replace(
            prob, ocp=dataclasses.replace(prob.ocp, dynamics_u_cols=None)
        )
    ddp_off, al_off = al_serving_options(max_iters=15)
    offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
    # online budget: 5 inner iterations (the reference's online
    # max_iteration cap, launch:20), one frozen-penalty outer per tick
    ddp_on, al_on = al_serving_options(max_iters=online_iters)
    online = ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)

    B = batch
    ns = prob.ocp.ns
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    key = jax.random.key(11)
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, dtype)
    U0 = jnp.tile(prob.static_input[None], (ns, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )

    # offline fleet seed (full AL schedule, batched)
    st0 = jax.vmap(lambda x: offline.init(x, U0=U0))(x0)
    st = jax.jit(offline.solve_batch)(st0, x0, params)
    jax.block_until_ready(st.viol)
    seed_viol = float(jnp.max(st.viol))

    wpg = WalkingPatternGenerator.build(
        0.0, ns, dtype=dtype,
        swing_profile="smooth" if smooth_swing else "reference",
    )
    period = 2 * wpg.step_nodes
    # --prior tail|full: gait-phase-indexed multiplier priors
    # (ALDDP.PhasePrior / FullPhasePrior). "tail" seeds only the
    # injected tail rows; "full" replaces the whole equality-multiplier
    # field from per-phase tables (each (node, phase) entry converges
    # across gait cycles — the round-5 serving config; see the
    # FullPhasePrior docstring for why tail-only is not enough).
    if prior == "full":
        seed_fn = online._seed_full_prior
        upd_fn = online._update_full_prior
        mk_prior = online.init_full_phase_prior
        prior_ema = 1.0
    elif prior:
        seed_fn = online._seed_from_prior
        upd_fn = online._update_prior
        mk_prior = online.init_phase_prior
        prior_ema = 0.5
    else:
        mk_prior = online.init_phase_prior  # carried but unused

    def tick(st, params, wpg_state, action, rdot_ref, pr, viol_hi):
        # cycle phase of THIS tick's terminal write (read before advance)
        phase = wpg_state.step_counter % period
        p1, w1 = jax.vmap(
            lambda p, s, a: wpg.advance(p, s, a)
        )(params, wpg_state, action)
        p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(rdot_ref[:, None, :])
        x0 = st.sol.X[:, 1]
        if shift:
            # roll trajectory + multipliers one node forward, aligning
            # the warm start with the shifted schedule (--shift A/B)
            st = jax.vmap(online.shift_warmstart)(st)
        if prior:
            st = jax.vmap(seed_fn)(st, pr, phase)
        # --outers N: N frozen-penalty outer iterations per tick (each =
        # inner solve + multiplier update). Two cheap outers beat one
        # deep one on the touchdown-transient spikes: the second
        # λ-update re-centers the stale multiplier at the schedule
        # discontinuity (CPU A/B: 1×2 → max 6.0e-3; 2×1 → 1.91e-3).
        for _ in range(outers):
            st = online.solve_online_batch(st, x0, p1)
        if prior:
            pr = jax.vmap(
                upd_fn, in_axes=(0, 0, 0, None)
            )(pr, st, phase, prior_ema)
        # device-side running max of the fleet violation, carried INSIDE
        # the jitted tick: an eager (un-jitted) update here costs two
        # op-by-op dispatches per tick through the remote tunnel and
        # breaks chained-dispatch pipelining (measured 14 -> 27 ms/tick)
        viol_hi = jnp.maximum(viol_hi, jnp.max(st.viol))
        return st, p1, w1, pr, viol_hi

    if chunk:
        from srbd_horizon_tpu.runtime.chunked import chunk_map

        # action/rdot_ref are fleet-batched too, so the whole tick
        # chunks; viol_hi is per-member inside chunk_map (reduced to a
        # scalar at readout)
        tick = chunk_map(tick, chunk)
    tick_j = jax.jit(tick, donate_argnums=(0, 1, 2, 5, 6))

    wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
    action = jnp.ones((B,), jnp.int32)
    rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))
    # per-member phase tables (members may sit at different gait phases)
    pr = jax.vmap(lambda _: mk_prior(period, dtype))(jnp.arange(B))

    # the running window-max violation is carried through the jitted
    # tick itself (per-member under chunk_map: chunked leading axis)
    viol_hi = jnp.zeros((B,), dtype)

    # warmup/compile. With --prior, also run three full gait cycles so
    # the phase tables are populated AND converged before the measured
    # window (each (node, phase) entry receives one λ-update per cycle;
    # the cross-cycle iteration needs ~3 visits to settle — the same
    # steady-state discipline as the CPU battery, tools/diag_prior.py).
    st, params, wpg_state, pr, viol_hi = tick_j(
        st, params, wpg_state, action, rdot_ref, pr, viol_hi
    )
    jax.block_until_ready(st.viol)
    if prior:
        for _ in range(3 * period):
            st, params, wpg_state, pr, viol_hi = tick_j(
                st, params, wpg_state, action, rdot_ref, pr, viol_hi
            )
        jax.block_until_ready(st.viol)

    # reset the envelope so it covers exactly the measured window (the
    # touchdown spike lands at specific gait phases, so the final tick's
    # violation alone under-reports it)
    viol_hi = jnp.zeros((B,), dtype)
    lat_ms = []
    t0 = time.perf_counter()
    for _ in range(n_ticks):
        t1 = time.perf_counter()
        st, params, wpg_state, pr, viol_hi = tick_j(
            st, params, wpg_state, action, rdot_ref, pr, viol_hi
        )
        if sync:
            jax.block_until_ready(st.viol)
            lat_ms.append(1e3 * (time.perf_counter() - t1))
    jax.block_until_ready(st.viol)
    dt_s = (time.perf_counter() - t0) / n_ticks

    viol_max = float(jnp.max(st.viol))
    window_viol_max = float(jnp.max(viol_hi))
    out = {
        "metric": "isrbd_constrained_solves_per_s",
        "value": round(B / dt_s, 1),
        "unit": "solve/s",
        "batch": B,
        "tick_ms": round(1e3 * dt_s, 2),
        "seed_viol_max": seed_viol,
        "final_viol_max": viol_max,
        "window_viol_max": window_viol_max,
        "finite": bool(jnp.all(jnp.isfinite(st.sol.X))),
        "dtype": "float32",
        "inner": "dense" if dense else ("sparse_no_ucols" if no_ucols else "sparse"),
        "chunk": chunk,
        "shift_warmstart": shift,
        "online_iters": online_iters,
        "outers": outers,
        "phase_prior": prior,
        "cz_rho_weight": cz_w,
        "swing_profile": "smooth" if smooth_swing else "reference",
    }
    if sync:
        import numpy as np

        out["timing"] = "per_tick_sync"
        out["p50_ms"] = round(float(np.percentile(lat_ms, 50)), 2)
        out["p99_ms"] = round(float(np.percentile(lat_ms, 99)), 2)
        # DEVICE-side latency decomposition (same methodology as
        # bench.py): paired window differencing — time a chained
        # dispatch of W2 ticks and of W1 ticks (each pays one readback),
        # difference them so the tunnel RTT and readback cancel.
        w1, w2, reps = 2, 8, 12
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(w1):
                st, params, wpg_state = tick_j(
                    st, params, wpg_state, action, rdot_ref
                )
            jax.block_until_ready(st.viol)
            t1 = time.perf_counter()
            for _ in range(w2):
                st, params, wpg_state = tick_j(
                    st, params, wpg_state, action, rdot_ref
                )
            jax.block_until_ready(st.viol)
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / (w2 - w1))
        d = np.asarray(diffs) * 1e3
        out["device_p50_ms"] = round(float(np.percentile(d, 50)), 2)
        out["device_p99_ms"] = round(float(np.percentile(d, 99)), 2)
        # gate on the e2e p50 AND the device p99 (bench.py rationale):
        # every e2e sample pays one tunnel round-trip and multi-RTT
        # network spikes land in the e2e p99 (p50 44 ms stable while e2e
        # p99 swings 50-150 ms run-to-run) — but a genuine on-device
        # tail regression must fail the gate.
        out["realtime_ok"] = bool(
            out["p50_ms"] <= 100.0 and out["device_p99_ms"] <= 100.0
        )
    else:
        out["timing"] = "chained_dispatch"
    return out


def main():
    argv = sys.argv[1:]
    chunk = 0
    online_iters = 5
    if "--chunk" in argv:
        i = argv.index("--chunk")
        chunk = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--iters" in argv:
        i = argv.index("--iters")
        online_iters = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    outers = 1
    if "--outers" in argv:
        i = argv.index("--outers")
        outers = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    cz_w = 400.0
    if "--czw" in argv:
        i = argv.index("--czw")
        cz_w = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    prior = ""
    if "--prior" in argv:
        i = argv.index("--prior")
        # optional mode operand: --prior [tail|full] (bare = tail)
        if i + 1 < len(argv) and argv[i + 1] in ("tail", "full"):
            prior = argv[i + 1]
            argv = argv[:i] + argv[i + 2:]
        else:
            prior = "tail"
            argv = argv[:i] + argv[i + 1:]
    flags = ("--dense", "--no-ucols", "--sync", "--shift", "--cpu",
             "--smooth-swing")
    args = [a for a in argv if a not in flags]
    dense = "--dense" in argv
    no_ucols = "--no-ucols" in argv
    sync = "--sync" in argv
    shift = "--shift" in argv
    smooth_swing = "--smooth-swing" in argv
    if "--cpu" in argv:
        jax.config.update("jax_platforms", "cpu")
    batch = int(args[0]) if len(args) > 0 else 1024
    n_ticks = int(args[1]) if len(args) > 1 else 30
    print(json.dumps(measure(
        batch, n_ticks, dense=dense, no_ucols=no_ucols, sync=sync,
        chunk=chunk, shift=shift, online_iters=online_iters,
        outers=outers, prior=prior, cz_w=cz_w,
        smooth_swing=smooth_swing)))


if __name__ == "__main__":
    main()
