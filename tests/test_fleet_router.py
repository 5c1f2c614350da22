"""Native fleet command router (native/bridge router_* + runtime.bridge.
FleetRouter): B robots' UDP command streams fan into one per-tick
snapshot; per-robot result rows fan back out — the fleet-scale analog of
the reference's per-robot ROS graph (SURVEY.md §5.8).

Skipped when the native library cannot be built (no C++ toolchain)."""

import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from srbd_horizon_tpu.runtime.bridge import (
    FleetRouter, get_lib, recv_result, send_command,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native bridge library unavailable"
)


def _port(offset=0):
    return 42000 + (os.getpid() + offset) % 15000


class TestFleetRouter:
    def test_fan_in_fan_out(self):
        """Each robot's latest command lands in its slot; each robot
        receives exactly its own result row back."""
        B = 8
        port = _port()
        router = FleetRouter(port, B)
        socks = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                 for _ in range(B)]
        try:
            for i, s in enumerate(socks):
                send_command(s, ("127.0.0.1", port), i, action=1,
                             vx=0.1 * i, vy=-0.05 * i, wz=0.01 * i)
            deadline = time.time() + 3.0
            seen = 0
            while time.time() < deadline and seen < B:
                actions, rdot, wz, counts, seen = router.snapshot()
                time.sleep(0.005)
            assert seen == B, counts.tolist()
            np.testing.assert_array_equal(actions, np.ones(B, np.int32))
            np.testing.assert_allclose(rdot[:, 0], 0.1 * np.arange(B),
                                       rtol=1e-6)
            np.testing.assert_allclose(rdot[:, 1], -0.05 * np.arange(B),
                                       rtol=1e-6)
            np.testing.assert_allclose(wz, 0.01 * np.arange(B), rtol=1e-6)
            assert rdot[:, 2].max() == 0.0

            rows = np.arange(B * 5, dtype=np.float32).reshape(B, 5)
            assert router.send_results(rows) == B
            for i, s in enumerate(socks):
                res = recv_result(s, timeout=2.0)
                assert res is not None, f"robot {i} got no result"
                rid, vals = res
                assert rid == i
                np.testing.assert_allclose(vals, rows[i], rtol=0)
        finally:
            router.close()
            for s in socks:
                s.close()

    def test_latest_command_wins(self):
        """Multiple packets from one robot: the snapshot holds the most
        recent; the count tracks every accepted packet."""
        port = _port(1)
        router = FleetRouter(port, 2)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            for k in range(5):
                send_command(s, ("127.0.0.1", port), 0, action=k % 3,
                             vx=float(k))
            deadline = time.time() + 3.0
            counts = np.zeros(2)
            while time.time() < deadline and counts[0] < 5:
                actions, rdot, _, counts, _ = router.snapshot()
                time.sleep(0.005)
            assert counts[0] == 5
            assert counts[1] == 0            # robot 1 never spoke
            assert rdot[0, 0] == 4.0         # latest wins
            # unheard robots default to stance (zeros)
            assert actions[1] == 0 and rdot[1].max() == 0.0
        finally:
            router.close()
            s.close()

    def test_garbage_and_out_of_range_ignored(self):
        """Malformed packets and out-of-range robot ids must not crash
        the receive loop or corrupt slots."""
        port = _port(2)
        router = FleetRouter(port, 2)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.sendto(b"not-a-packet", ("127.0.0.1", port))
            s.sendto(b"\x00" * 24, ("127.0.0.1", port))
            send_command(s, ("127.0.0.1", port), 99, 1, 1.0)  # id >= B
            send_command(s, ("127.0.0.1", port), 1, 2, 0.5)
            deadline = time.time() + 3.0
            counts = np.zeros(2)
            while time.time() < deadline and counts[1] < 1:
                actions, rdot, _, counts, _ = router.snapshot()
                time.sleep(0.005)
            assert counts[1] == 1 and counts[0] == 0
            assert actions[1] == 2 and abs(rdot[1, 0] - 0.5) < 1e-6
        finally:
            router.close()
            s.close()


class TestServeFleetE2E:
    def test_selftest_daemon(self):
        """End-to-end: the serving daemon (batched MPC + health gate +
        router) serves in-process robot clients; every robot receives
        result rows (examples/serve_fleet.py --selftest)."""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "examples/serve_fleet.py", "--cpu",
             "--robots", "4", "--ticks", "8", "--hz", "50",
             "--selftest", "--port", str(_port(3))],
            capture_output=True, text=True, timeout=600,
            cwd=Path(__file__).resolve().parents[1], env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "selftest: 4/4 robots received results -> ok" in out.stdout

    def test_selftest_daemon_constrained(self):
        """The --constrained daemon (offline AL seed + 2-outer RTI
        serving tick + constrained health gate + router) serves every
        robot a result row with a bounded violation column."""
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        out = subprocess.run(
            [sys.executable, "examples/serve_fleet.py", "--cpu",
             "--robots", "4", "--ticks", "8", "--hz", "50",
             "--selftest", "--constrained", "--port", str(_port(4))],
            capture_output=True, text=True, timeout=900,
            cwd=Path(__file__).resolve().parents[1], env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "selftest: 4/4 robots received results -> ok" in out.stdout
        assert "resets=0" in out.stdout
