"""Native IPC bridge tests: UDP pub/sub roundtrip and shared-memory ring
(the ROS pub/sub replacement, SURVEY.md §5.8)."""

import os
import shutil

import numpy as np
import pytest

from srbd_horizon_tpu.runtime.bridge import (
    Publisher,
    ShmRing,
    Subscriber,
    get_lib,
)

HAS_TOOLCHAIN = shutil.which("g++") is not None


class TestPubSub:
    def test_roundtrip_json(self):
        port = 47399
        sub = Subscriber(port)
        pub = Publisher("127.0.0.1", port)
        try:
            pub.publish_json(
                "solution_time", {"tick": 3, "solve_ms": 12.5}
            )
            msg = sub.poll_json(timeout_ms=2000)
            assert msg is not None
            topic, payload = msg
            assert topic == "solution_time"
            assert payload == {"tick": 3, "solve_ms": 12.5}
        finally:
            pub.close()
            sub.close()

    def test_roundtrip_binary(self):
        port = 47398
        sub = Subscriber(port)
        pub = Publisher("127.0.0.1", port)
        try:
            data = np.arange(37, dtype=np.float32).tobytes()
            pub.publish("state", data)
            msg = sub.poll(timeout_ms=2000)
            assert msg is not None
            topic, payload = msg
            assert topic == "state"
            np.testing.assert_array_equal(
                np.frombuffer(payload, np.float32),
                np.arange(37, dtype=np.float32),
            )
        finally:
            pub.close()
            sub.close()

    @pytest.mark.skipif(not HAS_TOOLCHAIN, reason="no C++ toolchain")
    def test_native_backend_active(self):
        assert get_lib() is not None
        pub = Publisher()
        assert pub.native
        pub.close()


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
class TestShmRing:
    def test_push_pop(self):
        name = f"/srbd_test_ring_{os.getpid()}"
        ring = ShmRing(name, capacity=4096)
        try:
            for i in range(5):
                assert ring.push(f"msg-{i}".encode())
            out = []
            while (m := ring.pop()) is not None:
                out.append(m.decode())
            assert out == [f"msg-{i}" for i in range(5)]
        finally:
            ring.close()

    def test_full_ring_rejects(self):
        name = f"/srbd_test_ring2_{os.getpid()}"
        ring = ShmRing(name, capacity=64)
        try:
            payload = b"x" * 40
            assert ring.push(payload)
            assert not ring.push(payload)  # full
            assert ring.pop() == payload
            assert ring.push(payload)  # space reclaimed
        finally:
            ring.close()

    def test_wraparound(self):
        name = f"/srbd_test_ring3_{os.getpid()}"
        ring = ShmRing(name, capacity=128)
        try:
            for i in range(50):  # forces cursor wraparound many times
                msg = bytes([i]) * (i % 20 + 1)
                assert ring.push(msg)
                assert ring.pop() == msg
        finally:
            ring.close()


class TestSanitizers:
    """SURVEY.md §5.2 (race detection / sanitizers): the SPSC ring's
    release/acquire protocol and the UDP framing, machine-checked under
    ThreadSanitizer and AddressSanitizer+UBSan. The harness
    (native/bridge/bridge_stress_test.cpp) runs a real concurrent
    producer/consumer pair through 200k records on a deliberately tiny
    (constant-wraparound) ring and verifies every record's content."""

    @pytest.mark.skipif(not HAS_TOOLCHAIN, reason="no g++")
    @pytest.mark.parametrize("binary", ["bridge_tsan_test", "bridge_asan_test"])
    def test_stress_under_sanitizer(self, binary):
        import pathlib
        import subprocess

        bridge_dir = pathlib.Path(__file__).resolve().parents[1] / "native" / "bridge"
        build = subprocess.run(
            ["make", "-s", "-C", str(bridge_dir), binary],
            capture_output=True, text=True,
        )
        if build.returncode != 0:
            pytest.skip(f"sanitizer build unavailable: {build.stderr[-200:]}")
        run = subprocess.run(
            [str(bridge_dir / binary)], capture_output=True, text=True,
            timeout=300,
        )
        assert run.returncode == 0, (
            f"{binary} failed:\n{run.stdout[-1000:]}\n{run.stderr[-2000:]}"
        )
        assert "OK" in run.stdout
