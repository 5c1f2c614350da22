"""Long-run serving soak: N closed-loop fleet ticks on the accelerator
with periodic health readbacks — evidence that the serving path is
stable over sustained operation, not just over a 20-tick bench window
(the reference's runs are open-ended interactive sessions,
dsrbd_example.py:82; here the equivalent is a bounded soak with
machine-checked drift bounds).

Checks per readback window (default every 100 ticks):
  - every state finite,
  - fleet CoM height inside a ±10 cm band around nominal,
  - max multiple-shooting defect below 1e-4,
  - solver iterations healthy (mean ≥ 1 — a frozen solver reads as 0).

Prints one JSON line with per-window p50/p99 wall times and the drift
envelope over the whole run.

Usage: python tools/soak.py [batch] [ticks] [--cpu] [--constrained]
                            [--checkpoint PATH] [--resume]

`--checkpoint PATH` snapshots the full fleet state (solver plan + AL
multipliers + parameter pytree + gait phase + tick index) after every
health window via runtime.checkpoint; `--resume` restarts from the
snapshot — a SIGKILLed soak continues where it died with bit-identical
fleet state (tests/test_crash_resume.py SIGKILLs one mid-run and checks
the resumed windows match an uninterrupted run). The reference's only
analog is in-process warm-starting (reference ddp.py:113-117).

`--constrained` soaks the AL fleet-serving path instead (the
tools/bench_isrbd.py workload: shifted warm starts, frozen-penalty
outer updates per tick over the walking gait) with violation-window
health gates: finite states, fleet max scaled violation below 5e-3 per
window, inner iterations healthy. `--prior [--czw W]` switches to the
round-5 serving config (full-field gait-phase multiplier tables +
stiff cz rows, default ONE outer — BENCH_NOTES.md round 5); without it
the round-4 2-outer config runs.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main_constrained(batch=256, ticks=1000, window=100,
                     online_iters=1, outers=2,
                     checkpoint=None, resume=False,
                     prior=False, cz_w=400.0):
    window = max(1, min(window, ticks))
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
    ddp_off, al_off = al_serving_options(max_iters=15)
    offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
    ddp_on, al_on = al_serving_options(max_iters=online_iters)
    online = ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)

    B, ns = batch, prob.ocp.ns
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(jax.random.key(11), x0.shape, dtype)
    U0 = jnp.tile(prob.static_input[None], (ns, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    st = jax.jit(offline.solve_batch)(
        jax.vmap(lambda x: offline.init(x, U0=U0))(x0), x0, params
    )
    wpg = WalkingPatternGenerator.build(0.0, ns, dtype=dtype)
    period = 2 * wpg.step_nodes
    # --prior: the round-5 serving config — full-field gait-phase
    # multiplier tables (ALDDP.FullPhasePrior) seeded into every tick
    pr = jax.vmap(
        lambda _: online.init_full_phase_prior(period, dtype)
    )(jnp.arange(B))

    def tick(st, params, wpg_state, action, rdot_ref, pr):
        phase = wpg_state.step_counter % period
        p1, w1 = jax.vmap(
            lambda p, s, a: wpg.advance(p, s, a)
        )(params, wpg_state, action)
        p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(rdot_ref[:, None, :])
        x0n = st.sol.X[:, 1]
        if prior:
            st, pr = online.serving_tick_batch(
                st, x0n, p1, outers=outers, prior=pr, phase=phase
            )
        else:
            st = online.serving_tick_batch(st, x0n, p1, outers=outers)
        return st, p1, w1, pr

    tick_j = jax.jit(tick, donate_argnums=(0, 1, 2, 5))
    wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
    action = jnp.ones((B,), jnp.int32)
    rdot_ref = jax.device_put(
        jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))
    )
    st, params, wpg_state, pr = tick_j(
        st, params, wpg_state, action, rdot_ref, pr
    )
    float(jnp.sum(st.viol))  # compile + drain
    if prior:
        # table warmup: the per-phase tables start empty and the first
        # cycles run effectively prior-less at the stiff cz weights —
        # let them converge before the gated windows (same discipline
        # as tools/bench_isrbd.py's 3-cycle prior warmup)
        for _ in range(3 * period):
            st, params, wpg_state, pr = tick_j(
                st, params, wpg_state, action, rdot_ref, pr
            )
        float(jnp.sum(st.viol))

    # Crash-resume (runtime/checkpoint.py): restore the full fleet state
    # — solver plan + AL multipliers + params + gait phase + window
    # index — or fall through to the fresh seed above when no snapshot
    # exists yet. Restored AFTER the compile-warmup tick (whose state
    # advance is discarded here), so the resumed tick stream continues
    # the snapshot exactly — bit-identical windows vs an uninterrupted
    # run. Saved after every health window (the host read is already
    # paid there).
    w_start = 0
    if checkpoint and resume:
        from srbd_horizon_tpu.runtime.checkpoint import load_pytree

        template = {"st": st, "params": params, "wpg_state": wpg_state,
                    "pr": pr, "window": jnp.asarray(0, jnp.int32)}
        try:
            snap = load_pytree(checkpoint, template)
            st, params, wpg_state, pr = (
                snap["st"], snap["params"], snap["wpg_state"], snap["pr"]
            )
            w_start = int(snap["window"])
            print(f"resumed from {checkpoint} at window {w_start}",
                  file=sys.stderr, flush=True)
        except FileNotFoundError:
            print(f"no checkpoint at {checkpoint}; starting fresh",
                  file=sys.stderr, flush=True)

    windows = []
    viol_hi, ok = 0.0, True
    t_start = time.perf_counter()
    for w in range(w_start, ticks // window):
        t0 = time.perf_counter()
        for _ in range(window):
            st, params, wpg_state, pr = tick_j(
                st, params, wpg_state, action, rdot_ref, pr
            )
        viol = np.asarray(st.viol)   # host read = drain
        dt_w = (time.perf_counter() - t0) / window
        finite = bool(np.all(np.isfinite(np.asarray(st.sol.X))))
        vmax = float(viol.max())
        viol_hi = max(viol_hi, vmax)
        iters = float(np.mean(np.asarray(st.sol.iterations)))
        w_ok = finite and vmax < 5e-3 and iters >= 1.0
        ok = ok and w_ok
        windows.append(dt_w)
        print(
            f"window {w:3d}: {dt_w*1e3:7.2f} ms/tick  viol_max={vmax:.2e} "
            f"iters={iters:.2f} {'ok' if w_ok else 'FAIL'}",
            file=sys.stderr, flush=True,
        )
        if checkpoint:
            from srbd_horizon_tpu.runtime.checkpoint import save_pytree

            save_pytree(checkpoint, {
                "st": st, "params": params, "wpg_state": wpg_state,
                "pr": pr, "window": jnp.asarray(w + 1, jnp.int32),
            })

    wall = time.perf_counter() - t_start
    wt = np.asarray(windows) * 1e3
    print(json.dumps({
        "metric": "constrained_soak_ticks",
        "ticks": ticks,
        "batch": B,
        "resumed_from_window": w_start,
        "solves": ticks * B,
        "wall_s": round(wall, 1),
        "solves_per_s": round(ticks * B / wall, 1),
        "window_mean_tick_ms_p50": round(float(np.percentile(wt, 50)), 2),
        "window_mean_tick_ms_p99": round(float(np.percentile(wt, 99)), 2),
        "max_viol": viol_hi,
        "ok": ok,
        "device": str(jax.devices()[0]),
    }))
    return 0 if ok else 1


def main(batch=512, ticks=1000, window=100, checkpoint=None, resume=False):
    window = max(1, min(window, ticks))
    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=5, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
    loop = MPCLoop(solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants,
                   shift_warmstart=True)

    B = batch
    key = jax.random.key(0)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.005 * jax.random.normal(key, x0.shape, dtype)
    carries = jax.vmap(loop.init)(x0)
    vtick = jax.jit(loop.tick_batch, donate_argnums=(0,))
    inp = jax.device_put(TickInput(
        action=jnp.ones(B, jnp.int32),
        rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0], dtype)[None], (B, 1)),
        w_ref=jnp.zeros((B, 3), dtype),
    ))

    carries, out = vtick(carries, inp)
    float(jnp.sum(out.x))  # compile + drain

    # crash-resume: restore the fleet carry (sim state + plan + params +
    # gait phase) after the compile-warmup tick — see main_constrained
    w_start = 0
    if checkpoint and resume:
        from srbd_horizon_tpu.runtime.checkpoint import load_pytree

        template = {"carries": carries, "window": jnp.asarray(0, jnp.int32)}
        try:
            snap = load_pytree(checkpoint, template)
            carries = snap["carries"]
            w_start = int(snap["window"])
            print(f"resumed from {checkpoint} at window {w_start}",
                  file=sys.stderr, flush=True)
        except FileNotFoundError:
            print(f"no checkpoint at {checkpoint}; starting fresh",
                  file=sys.stderr, flush=True)

    z_nom = float(prob.initial_state[2])
    windows = []
    z_lo, z_hi, defect_hi, res_hi = np.inf, -np.inf, 0.0, 0.0
    ok = True
    t_start = time.perf_counter()
    for w in range(w_start, ticks // window):
        t0 = time.perf_counter()
        for _ in range(window):
            carries, out = vtick(carries, inp)
        x = np.asarray(out.x)          # host read = drain
        dt_w = (time.perf_counter() - t0) / window
        finite = bool(np.all(np.isfinite(x)))
        z = x[:, 2]
        z_lo, z_hi = min(z_lo, float(z.min())), max(z_hi, float(z.max()))
        defect = float(np.max(np.asarray(out.defect_norm)))
        res = float(np.max(np.abs(np.asarray(out.srbd_residual))))
        defect_hi = max(defect_hi, defect)
        res_hi = max(res_hi, res)
        iters = float(np.mean(np.asarray(out.iterations)))
        w_ok = (finite and abs(z.min() - z_nom) < 0.10
                and abs(z.max() - z_nom) < 0.10
                and defect < 1e-4 and iters >= 1.0)
        ok = ok and w_ok
        windows.append(dt_w)
        print(f"window {w:3d}: {dt_w*1e3:7.2f} ms/tick  z=[{z.min():.3f},"
              f"{z.max():.3f}] defect={defect:.1e} iters={iters:.2f} "
              f"{'ok' if w_ok else 'FAIL'}", file=sys.stderr, flush=True)
        if checkpoint:
            from srbd_horizon_tpu.runtime.checkpoint import save_pytree

            save_pytree(checkpoint, {
                "carries": carries,
                "window": jnp.asarray(w + 1, jnp.int32),
            })

    wall = time.perf_counter() - t_start
    wt = np.asarray(windows) * 1e3
    print(json.dumps({
        "metric": "soak_ticks",
        "ticks": ticks,
        "batch": B,
        "resumed_from_window": w_start,
        "solves": ticks * B,
        "wall_s": round(wall, 1),
        "solves_per_s": round(ticks * B / wall, 1),
        # Percentiles over per-WINDOW mean tick times (ticks chain on
        # device inside a window — there is no per-tick host sync to time
        # without breaking the dispatch pipeline), NOT per-tick tails.
        "window_mean_tick_ms_p50": round(float(np.percentile(wt, 50)), 2),
        "window_mean_tick_ms_p99": round(float(np.percentile(wt, 99)), 2),
        "z_band": [round(z_lo, 4), round(z_hi, 4)],
        "max_defect": defect_hi,
        "max_srbd_residual": res_hi,
        "ok": ok,
        "device": str(jax.devices()[0]),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    argv = sys.argv[1:]
    checkpoint = None
    if "--checkpoint" in argv:
        i = argv.index("--checkpoint")
        checkpoint = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    window = 100
    if "--window" in argv:
        i = argv.index("--window")
        window = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    cz_w = 400.0
    if "--czw" in argv:
        i = argv.index("--czw")
        cz_w = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    outers = None
    if "--outers" in argv:
        i = argv.index("--outers")
        outers = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    resume = "--resume" in argv
    prior = "--prior" in argv
    if "--cpu" in argv:
        import os

        jax.config.update("jax_platforms", "cpu")
        # share the suite's persistent compilation cache: CPU soaks are
        # spawned repeatedly by tests (crash-resume) and re-runs —
        # identical executables should not recompile per process
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("SRBD_XLA_CACHE", "/tmp/srbd_horizon_xla_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    constrained = "--constrained" in argv
    argv = [a for a in argv
            if a not in ("--cpu", "--constrained", "--resume", "--prior")]
    b = int(argv[0]) if len(argv) > 0 else (256 if constrained else 512)
    t = int(argv[1]) if len(argv) > 1 else 1000
    sys.exit(
        main_constrained(b, t, window=window, checkpoint=checkpoint,
                         resume=resume, prior=prior, cz_w=cz_w,
                         outers=(outers if outers is not None
                                 else (1 if prior else 2)))
        if constrained
        else main(b, t, window=window, checkpoint=checkpoint, resume=resume)
    )
