#!/usr/bin/env python
"""Fleet MPC serving daemon — B robots, ONE process, ONE accelerator.

Each robot sends 24-byte UDP command packets (robot_id, action, vx, vy,
wz) to the native fleet router (C++ receive thread, runtime/bridge.py
FleetRouter); every tick the serving loop snapshots the whole fleet's
latest commands, runs one batched MPC tick, and fans each robot its
result row [x, y, z, cost, iterations, converged] back over UDP.

This is the fleet-scale version of the reference's per-robot ROS graph
(/joy in + telemetry out per process, SURVEY.md §5.8): the reference
serves ONE robot per process at 10 Hz; this serves the whole fleet from
one process at the same per-robot rate.

Drive it with simulated robots:
    python examples/serve_fleet.py --cpu --robots 16 --ticks 50 &
    python examples/fleet_client.py <port> <robot_id> 0.2   # per robot

Or run the built-in selftest (spawns client threads in-process):
    python examples/serve_fleet.py --cpu --robots 16 --ticks 40 --selftest
"""

import argparse
import pathlib
import socket
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--port", type=int, default=0,
                    help="command port (default: 41000 + pid%%10000)")
    ap.add_argument("--hz", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--selftest", action="store_true",
                    help="spawn in-process simulated robot clients")
    ap.add_argument("--constrained", action="store_true",
                    help="serve the full-NLP (AL/isrbd) path: active "
                         "friction cones, force boxes, hybrid dynamics — "
                         "the round-4 2-outer RTI serving tick")
    ap.add_argument("--prior", action="store_true",
                    help="constrained only: the round-5 serving config — "
                         "gait-phase multiplier tables "
                         "(ALDDP.FullPhasePrior) + stiff cz rows "
                         "(--czw), ONE monitored outer per tick")
    ap.add_argument("--czw", type=float, default=None,
                    help="contact-height AL stiffness "
                         "(build_isrbd_problem cz_rho_weight; default "
                         "400, or 3200 with --prior)")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="periodically snapshot the fleet state (solver "
                         "plan, multipliers, params, gait phase, tick) to "
                         "this path via runtime.checkpoint")
    ap.add_argument("--checkpoint-every", type=int, default=20,
                    help="ticks between snapshots (default 20)")
    ap.add_argument("--resume", action="store_true",
                    help="restore the fleet from --checkpoint if present: "
                         "a SIGKILLed daemon continues where it died "
                         "instead of re-seeding from scratch")
    ap.add_argument("--viz", choices=("term", "svg"), default=None,
                    help="live fleet telemetry view (io/live.py): 'term' "
                         "redraws a dashboard in the terminal, 'svg' "
                         "rewrites --viz-path every few ticks (the 10 Hz "
                         "RViz-loop analog, dsrbd_example.py:139-149)")
    ap.add_argument("--viz-path", type=str, default="fleet_live.svg")
    args = ap.parse_args()
    port = args.port or 41000 + (pathlib.os.getpid() % 10000)

    if args.cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # persistent compile cache (see tools/soak.py note): selftest
        # daemons are spawned repeatedly by the test suite
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("SRBD_XLA_CACHE", "/tmp/srbd_horizon_xla_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.srbd import build_srbd_problem
    from srbd_horizon_tpu.runtime.bridge import (
        FleetRouter, recv_result, send_command,
    )
    from srbd_horizon_tpu.runtime.health import HealthMonitor
    from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
    from srbd_horizon_tpu.solvers.msddp import MSDDP
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float64 if args.f64 else jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    B = args.robots

    if args.constrained:
        # Full-NLP serving (the isrbd workload): offline AL seed once,
        # then per tick: WPG advance from router commands + shifted warm
        # start + TWO single-inner-iteration monitored outer updates
        # (the round-4 RTI serving config, BENCH_NOTES.md) with failure
        # detection/recovery on the final state.
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
        from srbd_horizon_tpu.solvers.alddp import ALDDP
        from srbd_horizon_tpu.solvers.options import al_serving_options

        cz_w = args.czw if args.czw is not None else (
            3200.0 if args.prior else 400.0
        )
        prob = build_isrbd_problem(cfg, kangaroo_line_feet(),
                                   cz_rho_weight=cz_w)
        ddp_off, al_off = al_serving_options(max_iters=15)
        offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
        ddp_on, al_on = al_serving_options(max_iters=1)
        online = ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)
        monitor = HealthMonitor()
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
        # NOTE: named gait_period, not period — the serving loop below
        # rebinds `period` to the wall-clock tick period (1/hz) and the
        # jitted closure captures by name
        gait_period = 2 * wpg.step_nodes

        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
        prior_tables = jax.vmap(
            lambda _: online.init_full_phase_prior(gait_period, dtype)
        )(jnp.arange(B))
        # crash-resume: restore the fleet (plan + AL multipliers + phase
        # tables + params + gait phase + tick) instead of re-running the
        # offline seed
        start_tick = 0
        al_state = None
        if args.checkpoint and args.resume:
            from srbd_horizon_tpu.runtime.checkpoint import load_pytree

            template = {
                "al_state": jax.vmap(
                    lambda x: offline.init(x, U0=U0)
                )(x0),
                "params": params, "wpg_state": wpg_state,
                "pr": prior_tables,
                "tick": jnp.asarray(0, jnp.int32),
            }
            try:
                snap = load_pytree(args.checkpoint, template)
                al_state, params, wpg_state, prior_tables = (
                    snap["al_state"], snap["params"], snap["wpg_state"],
                    snap["pr"],
                )
                start_tick = int(snap["tick"])
                print(f"resumed fleet from {args.checkpoint} at tick "
                      f"{start_tick}", flush=True)
            except FileNotFoundError:
                print(f"no checkpoint at {args.checkpoint}; seeding fresh",
                      flush=True)
        if al_state is None:
            print("seeding constrained fleet (offline AL solve)...",
                  flush=True)
            al_state = jax.jit(offline.solve_batch)(
                jax.vmap(lambda x: offline.init(x, U0=U0))(x0), x0, params
            )

        @jax.jit
        def ctick(st, params, wpg_state, inp, pr):
            phase = wpg_state.step_counter % gait_period
            p1, w1 = jax.vmap(
                lambda p, s, a: wpg.advance(p, s, a)
            )(params, wpg_state, inp.action)
            p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(
                inp.rdot_ref[:, None, :]
            )
            x0n = st.sol.X[:, 1]
            st = jax.vmap(online.shift_warmstart)(st)
            if args.prior:
                # round-5 config: table-seeded multipliers, ONE
                # monitored outer (BENCH_NOTES round 5)
                st = jax.vmap(online._seed_full_prior)(st, pr, phase)
            else:
                # round-4 config: first plain outer, second monitored
                st = online.solve_online_batch(st, x0n, p1)
            st, report = monitor.monitored_constrained_tick(
                online, st, x0n, p1,
                x_safe=prob.initial_state, u_safe=prob.static_input,
            )
            if args.prior:
                pr = jax.vmap(
                    online._update_full_prior, in_axes=(0, 0, 0, None)
                )(pr, st, phase, 1.0)
                # a reset member's tables encode its divergence — wipe
                # them with the rest of its multiplier state
                ok = report.healthy
                pr = jax.tree.map(
                    lambda l: jnp.where(
                        ok.reshape((-1,) + (1,) * (l.ndim - 1)),
                        l, jnp.zeros_like(l),
                    ),
                    pr,
                )
            return st, p1, w1, report, pr
    else:
        prob = build_srbd_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=5, alpha_converge_threshold=1e-12,
                       beta=1e-3),
        )
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=dtype)
        loop = MPCLoop(solver=solver, wpg=wpg,
                       srbd_constants=prob.ocp.constants,
                       shift_warmstart=True)
        monitor = HealthMonitor()

        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        carries = jax.vmap(loop.init)(x0)
        # crash-resume: restore the fleet carry (sim state + plan +
        # params + gait phase) and the tick index
        start_tick = 0
        if args.checkpoint and args.resume:
            from srbd_horizon_tpu.runtime.checkpoint import load_pytree

            template = {"carries": carries,
                        "tick": jnp.asarray(0, jnp.int32)}
            try:
                snap = load_pytree(args.checkpoint, template)
                carries = snap["carries"]
                start_tick = int(snap["tick"])
                print(f"resumed fleet from {args.checkpoint} at tick "
                      f"{start_tick}", flush=True)
            except FileNotFoundError:
                print(f"no checkpoint at {args.checkpoint}; starting "
                      f"fresh", flush=True)

        @jax.jit
        def vtick(carry, inp):
            # tick + failure detection + in-place recovery, one jit
            return monitor.monitored_tick_batch(
                loop, carry, inp, x_safe=prob.initial_state
            )

    router = FleetRouter(port, B)
    print(f"serving {B} robots on udp:{port} at {args.hz} Hz", flush=True)

    view = None
    if args.viz:
        from srbd_horizon_tpu.io.live import LiveFleetView

        view = LiveFleetView(
            B, mode=args.viz,
            metric_label="viol" if args.constrained else "cost",
            svg_path=args.viz_path,
        )
        if args.viz == "svg":
            print(f"live view: {args.viz_path}", flush=True)

    clients = []
    results_seen = {}
    if args.selftest:
        stop = threading.Event()

        def client(rid):
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            # heterogeneous but feasible commands: the gait envelope
            # tops out ~0.35 m/s (0.5 s steps); commanding beyond it
            # makes the health monitor perpetually reset the member
            # (correct behavior, wrong demo)
            vx = 0.1 + 0.01 * (rid % 20)
            while not stop.is_set():
                send_command(s, ("127.0.0.1", port), rid, 1, vx, 0.0)
                res = recv_result(s, timeout=0.3)
                if res is not None and res[0] == rid:
                    results_seen[rid] = res[1]
            s.close()

        for rid in range(B):
            t = threading.Thread(target=client, args=(rid,), daemon=True)
            t.start()
            clients.append(t)

    period = 1.0 / args.hz
    deadline_misses = 0
    try:
        for t in range(start_tick, args.ticks):
            t0 = time.perf_counter()
            actions, rdot, _wz, counts, seen = router.snapshot()
            inp = TickInput(
                action=jnp.asarray(actions),
                rdot_ref=jnp.asarray(rdot, dtype),
                w_ref=jnp.zeros((B, 3), dtype),
            )
            if args.constrained:
                al_state, params, wpg_state, report, prior_tables = ctick(
                    al_state, params, wpg_state, inp, prior_tables
                )
                n_reset = B - int(np.sum(np.asarray(report.healthy)))
                x = np.asarray(al_state.sol.X[:, 1])  # node-1 plan state
                rows = np.zeros((B, 6), np.float32)
                rows[:, 0:3] = x[:, 0:3]
                rows[:, 3] = np.asarray(al_state.viol)
                rows[:, 4] = np.asarray(al_state.sol.iterations)
                rows[:, 5] = np.asarray(al_state.sol.converged)
            else:
                carries, out, report = vtick(carries, inp)
                n_reset = B - int(np.sum(np.asarray(report.healthy)))
                x = np.asarray(out.x)
                rows = np.zeros((B, 6), np.float32)
                rows[:, 0:3] = x[:, 0:3]
                rows[:, 3] = np.asarray(out.cost)
                rows[:, 4] = np.asarray(out.iterations)
                rows[:, 5] = np.asarray(out.converged)
            router.send_results(rows)
            if view is not None:
                view.update(t, rows)
            if args.checkpoint and (t + 1) % args.checkpoint_every == 0:
                from srbd_horizon_tpu.runtime.checkpoint import save_pytree

                if args.constrained:
                    save_pytree(args.checkpoint, {
                        "al_state": al_state, "params": params,
                        "wpg_state": wpg_state, "pr": prior_tables,
                        "tick": jnp.asarray(t + 1, jnp.int32),
                    })
                else:
                    save_pytree(args.checkpoint, {
                        "carries": carries,
                        "tick": jnp.asarray(t + 1, jnp.int32),
                    })
            dt = time.perf_counter() - t0
            if dt > period:
                deadline_misses += 1
            if t % 20 == 0:
                lbl = "viol_max" if args.constrained else "cost_mean"
                val = rows[:, 3].max() if args.constrained else rows[:, 3].mean()
                print(f"tick {t:4d}: {dt*1e3:6.1f} ms  robots_heard={seen} "
                      f"resets={n_reset} {lbl}={val:.4g}",
                      flush=True)
            time.sleep(max(0.0, period - dt))
    finally:
        if args.selftest:
            stop.set()
            for t in clients:
                t.join(timeout=1.0)
        router.close()

    print(f"done: {args.ticks} ticks, deadline_misses={deadline_misses}")
    if args.selftest:
        ok = len(results_seen) == B
        print(f"selftest: {len(results_seen)}/{B} robots received results "
              f"-> {'ok' if ok else 'FAIL'}")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
