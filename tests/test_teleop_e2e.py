"""End-to-end teleop → MPC → IK-reference pipeline over the native bridge
(VERDICT item 10): a REAL `examples/teleop_sender.py` subprocess publishes
velocity commands (the /joy role, reference dsrbd_example.py:49,86-99)
into a running closed-loop example, and the example's published
`cartesian_references` stream (the /cartesian/* CartesI/O topics,
cartesio.py:6-7) must track the commanded velocity."""

import json
import pathlib
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
EXAMPLES = REPO / "examples"


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestTeleopEndToEnd:
    def test_commanded_velocity_tracks_through_bridge(self):
        teleop_port = _free_port()
        telem_port = _free_port()

        # subscriber for the example's telemetry stream (bind before the
        # example starts so no datagrams are dropped on the floor)
        from srbd_horizon_tpu.runtime.bridge import Subscriber
        sub = Subscriber(telem_port)

        # the closed-loop example: would stand still forever on its own
        # (walk_start beyond the episode); only teleop can make it move
        example = subprocess.Popen(
            [
                sys.executable, str(EXAMPLES / "dlip_example.py"),
                "--cpu", "--ticks", "80", "--vx", "0.0",
                "--walk-start", "9999",
                "--teleop-port", str(teleop_port),
                "--telemetry-port", str(telem_port),
            ],
            cwd=str(EXAMPLES),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        # the real teleop sender, driven over stdin like a user:
        # 'www1' = vx +0.3, action=step; empty lines re-send (UDP-loss-proof)
        sender = subprocess.Popen(
            [sys.executable, str(EXAMPLES / "teleop_sender.py"),
             str(teleop_port)],
            cwd=str(EXAMPLES),
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL, text=True,
        )

        refs, times = [], []
        try:
            sender.stdin.write("www1\n")
            sender.stdin.flush()
            deadline = time.time() + 240
            while example.poll() is None and time.time() < deadline:
                msg = sub.poll_json(timeout_ms=100)
                if msg is not None:
                    topic, payload = msg
                    if topic == "cartesian_references":
                        refs.append(payload)
                    elif topic == "solution_time":
                        times.append(payload)
                # keep re-publishing the same command
                try:
                    sender.stdin.write("\n")
                    sender.stdin.flush()
                except BrokenPipeError:
                    pass
            # drain the tail
            while True:
                msg = sub.poll_json(timeout_ms=50)
                if msg is None:
                    break
                topic, payload = msg
                if topic == "cartesian_references":
                    refs.append(payload)
                elif topic == "solution_time":
                    times.append(payload)
        finally:
            try:
                sender.stdin.write("q\n")
                sender.stdin.flush()
            except (BrokenPipeError, ValueError):
                pass
            sender.wait(timeout=10)
            out = example.communicate(timeout=300)[0]

        assert example.returncode == 0, out[-2000:]
        assert len(times) > 10, f"telemetry stream too thin ({len(times)})"
        assert len(refs) > 10, f"IK reference stream too thin ({len(refs)})"

        # the commanded +x velocity must show up in the IK references:
        # late-episode CoM reference well ahead of the early one
        com_x = np.array([r["com"]["position"][0] for r in refs])
        early = com_x[: len(com_x) // 4].mean()
        late = com_x[-len(com_x) // 4 :].mean()
        assert late - early > 0.05, (early, late)
        # and the robot actually stepped (feet advanced too)
        lf_x = np.array(
            [r["left_sole_link"]["position"][0] for r in refs]
        )
        assert lf_x[-5:].mean() - lf_x[:5].mean() > 0.02
