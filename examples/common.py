"""Shared runner for the example applications (the reference's L5 scripts,
SURVEY.md §2.1 C5-C7). Headless: the joystick/keyboard teleop of the
reference (dsrbd_example.py:86-99) is replaced by a declarative motion
schedule; telemetry goes to .npz/.json instead of ROS topics."""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # virtual 8-device CPU mesh for the sharded examples (must be set
    # before the first JAX backend initialization)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(name: str):
    ap = argparse.ArgumentParser(description=name)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--vx", type=float, default=0.3)
    ap.add_argument("--vy", type=float, default=0.0)
    ap.add_argument("--walk-start", type=int, default=10)
    ap.add_argument("--out", type=str, default=f"/tmp/{name}")
    ap.add_argument("--f64", action="store_true", help="run in float64")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--chaos", action="store_true",
        help="(fleet) inject a NaN state + 10 m/s push mid-episode to "
        "exercise the HealthMonitor detect-and-reset path",
    )
    ap.add_argument(
        "--teleop-port", type=int, default=0,
        help="UDP port for live teleop commands (the reference's /joy "
        "topic role): JSON {vx, vy, action} on topic 'teleop' — see "
        "examples/teleop_sender.py",
    )
    ap.add_argument(
        "--telemetry-port", type=int, default=0,
        help="publish per-tick telemetry JSON over UDP (solution_time / "
        "srbd_constraint topic analogs)",
    )
    ap.add_argument(
        "--constrained", action="store_true",
        help="(quadruped) run the constrained AL/isrbd path — active "
        "friction cones, force boxes, hybrid SRBD/LIP schedule — with "
        "the round-4 2-outer RTI serving tick",
    )
    return ap.parse_args()


def setup(args):
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    return jnp.float64 if args.f64 else jnp.float32


def run_closed_loop(loop, prob, args, dtype, frames=None):
    from srbd_horizon_tpu.io.cartesio import CartesianReferenceFormatter
    from srbd_horizon_tpu.io.telemetry import TelemetryRecorder, export_trajectory_json
    from srbd_horizon_tpu.runtime.loop import TickInput, walking_schedule

    carry = loop.init(prob.initial_state)
    sched = walking_schedule(
        args.ticks, vx=args.vx, vy=args.vy, start=args.walk_start, dtype=dtype
    )
    tick = jax.jit(loop.tick)
    rec = TelemetryRecorder()
    if frames is None:
        # one IK frame per leg; the biped names match the reference
        # (dsrbd_example.py:179-182), other morphologies get foot_<leg>
        n_legs = prob.nc // prob.contact_model
        frames = (
            ["left_sole_link", "right_sole_link"] if n_legs == 2
            else [f"foot_{i}" for i in range(n_legs)]
        )
    ci = CartesianReferenceFormatter(frames, contact_model=prob.contact_model)

    # live teleop input (the /joy role, dsrbd_example.py:49,86-99) and
    # telemetry output (the /solution_time, /srbd_constraint topics) over
    # the native bridge
    teleop_sub = telemetry_pub = None
    if getattr(args, "teleop_port", 0):
        from srbd_horizon_tpu.runtime.bridge import Subscriber
        teleop_sub = Subscriber(args.teleop_port)
    if getattr(args, "telemetry_port", 0):
        from srbd_horizon_tpu.runtime.bridge import Publisher
        telemetry_pub = Publisher(port=args.telemetry_port)

    refs_last = None
    teleop_cmd = None
    for t in range(args.ticks):
        inp = jax.tree.map(lambda a: a[t], sched)
        if teleop_sub is not None:
            msg = teleop_sub.poll_json(timeout_ms=0)
            if msg is not None and msg[0] == "teleop":
                teleop_cmd = msg[1]
            if teleop_cmd is not None:
                inp = TickInput(
                    action=jnp.asarray(int(teleop_cmd.get("action", 1)), jnp.int32),
                    rdot_ref=jnp.asarray(
                        [teleop_cmd.get("vx", 0.0), teleop_cmd.get("vy", 0.0), 0.0],
                        dtype,
                    ),
                    w_ref=jnp.zeros(3, dtype),
                )
        rec.tick_start()
        carry, out = tick(carry, inp)
        jax.block_until_ready(out.x)
        rec.record(
            x=out.x, u0=out.u0, cost=out.cost, defect_norm=out.defect_norm,
            srbd_residual=out.srbd_residual, iterations=out.iterations,
        )
        sol = loop.solver.solution_dict(carry.sol)
        refs_last = ci.make_references(
            {k: np.asarray(v) for k, v in sol.items()}
        )
        if telemetry_pub is not None:
            telemetry_pub.publish_json("solution_time", {
                "tick": t, "cost": float(out.cost),
                "iterations": int(out.iterations),
            })
            telemetry_pub.publish_json(
                "srbd_constraint",
                {"residual": np.asarray(out.srbd_residual).tolist()},
            )
            telemetry_pub.publish_json("cartesian_references", refs_last)

    rec.save(args.out)
    sol = loop.solver.solution_dict(carry.sol)
    export_trajectory_json(
        args.out + "_plan.json",
        {k: np.asarray(v) for k, v in sol.items()},
        loop.ocp.dt,
    )
    summary = rec.summary()
    print("summary:", summary)
    print("final CoM:", np.asarray(carry.x[:3]))
    print("IK references (node 1):", refs_last)
    return carry, rec
