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
