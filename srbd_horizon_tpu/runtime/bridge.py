"""Python bindings for the native IPC bridge (native/bridge, C++) — the
ROS pub/sub replacement for the runtime (SURVEY.md §5.8). ctypes bindings
(no pybind11); auto-builds the shared library on first use when a C++
toolchain is available, with a pure-Python UDP fallback otherwise.

Message payloads are the caller's bytes; `publish_json`/`poll_json` add a
JSON codec for structured telemetry (the WrenchStamped/Float32 analogs)."""

from __future__ import annotations

import ctypes
import json
import socket
import struct
import subprocess
from pathlib import Path
from typing import Optional, Tuple

_MAGIC = 0x53524244
_LIB_DIR = Path(__file__).resolve().parents[2] / "native" / "bridge"
_LIB_PATH = _LIB_DIR / "libsrbd_bridge.so"


def _load_lib() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_LIB_DIR, check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.bridge_pub_create.restype = ctypes.c_void_p
    lib.bridge_pub_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.bridge_pub_send.restype = ctypes.c_int
    lib.bridge_pub_send.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.bridge_pub_destroy.argtypes = [ctypes.c_void_p]
    lib.bridge_sub_create.restype = ctypes.c_void_p
    lib.bridge_sub_create.argtypes = [ctypes.c_int]
    lib.bridge_sub_poll.restype = ctypes.c_int
    lib.bridge_sub_poll.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.bridge_sub_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
    lib.ring_pop.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.router_create.restype = ctypes.c_void_p
    lib.router_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.router_snapshot.restype = ctypes.c_int
    lib.router_snapshot.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.router_send_results.restype = ctypes.c_int
    lib.router_send_results.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.router_destroy.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None
_LIB_TRIED = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_lib()
        _LIB_TRIED = True
    return _LIB


def _frame(topic: str, payload: bytes) -> bytes:
    t = topic.encode()
    return (
        struct.pack("<IH", _MAGIC, len(t)) + t
        + struct.pack("<I", len(payload)) + payload
    )


def _unframe(pkt: bytes) -> Optional[Tuple[str, bytes]]:
    if len(pkt) < 10:
        return None
    magic, tlen = struct.unpack_from("<IH", pkt, 0)
    if magic != _MAGIC:
        return None
    topic = pkt[6 : 6 + tlen].decode()
    (plen,) = struct.unpack_from("<I", pkt, 6 + tlen)
    return topic, pkt[6 + tlen + 4 : 6 + tlen + 4 + plen]


class Publisher:
    """Topic publisher over UDP (native when available)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 47311):
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.bridge_pub_create(host.encode(), port)
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._dest = (host, port)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def publish(self, topic: str, payload: bytes) -> None:
        if self._lib is not None:
            self._lib.bridge_pub_send(
                self._h, topic.encode(), payload, len(payload)
            )
        else:
            self._sock.sendto(_frame(topic, payload), self._dest)

    def publish_json(self, topic: str, obj) -> None:
        self.publish(topic, json.dumps(obj).encode())

    def close(self) -> None:
        if self._lib is not None:
            self._lib.bridge_pub_destroy(self._h)
        else:
            self._sock.close()


class Subscriber:
    """Topic subscriber over UDP (native when available)."""

    def __init__(self, port: int = 47311):
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.bridge_sub_create(port)
            if not self._h:
                raise OSError(f"cannot bind UDP port {port}")
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind(("0.0.0.0", port))

    def poll(self, timeout_ms: int = 100) -> Optional[Tuple[str, bytes]]:
        if self._lib is not None:
            tbuf = ctypes.create_string_buffer(256)
            pbuf = ctypes.create_string_buffer(65536)
            n = self._lib.bridge_sub_poll(
                self._h, tbuf, 256, pbuf, 65536, timeout_ms
            )
            if n < 0:
                return None
            return tbuf.value.decode(), pbuf.raw[:n]
        self._sock.settimeout(timeout_ms / 1e3)
        try:
            pkt, _ = self._sock.recvfrom(65536)
        except socket.timeout:
            return None
        return _unframe(pkt)

    def poll_json(self, timeout_ms: int = 100):
        msg = self.poll(timeout_ms)
        if msg is None:
            return None
        return msg[0], json.loads(msg[1])

    def close(self) -> None:
        if self._lib is not None:
            self._lib.bridge_sub_destroy(self._h)
        else:
            self._sock.close()


_CMD_MAGIC = 0x464C5254  # "FLRT"
_RES_MAGIC = 0x464C5253  # "FLRS"


class FleetRouter:
    """Native fleet command router (C++ receive thread, off the GIL):
    B robots send 24-byte UDP command packets; the serving loop calls
    `snapshot()` once per tick to get the whole fleet's latest commands
    as arrays, and `send_results(rows)` to fan per-robot result rows
    back to each robot's last source address. The fleet-scale analog of
    the reference's per-robot ROS graph (/joy in, telemetry out —
    SURVEY.md §5.8): one process serves the whole fleet.

    Wire formats (little-endian):
      command: [u32 0x464C5254]["FLRT"][u32 robot_id][i32 action]
               [f32 vx][f32 vy][f32 wz]                (send_command)
      result:  [u32 0x464C5253][u32 robot_id][u32 n_vals][f32 × n_vals]
                                                        (recv_result)
    """

    def __init__(self, port: int, n_robots: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native bridge library unavailable")
        self._lib = lib
        self.n_robots = n_robots
        self._h = lib.router_create(port, n_robots)
        if not self._h:
            raise OSError(f"router_create(port={port}) failed")
        self._cmd = (ctypes.c_float * (4 * n_robots))()
        self._cnt = (ctypes.c_uint64 * n_robots)()

    def snapshot(self):
        """Latest per-robot commands: (actions int32 (B,), rdot_ref
        float32 (B, 3) as [vx, vy, 0], wz float32 (B,), counts uint64
        (B,), n_seen). Robots never heard from hold zeros (stance)."""
        import numpy as np

        seen = self._lib.router_snapshot(self._h, self._cmd, self._cnt)
        flat = np.ctypeslib.as_array(self._cmd).reshape(self.n_robots, 4)
        counts = np.ctypeslib.as_array(self._cnt).copy()
        actions = flat[:, 0].astype(np.int32)
        rdot = np.zeros((self.n_robots, 3), np.float32)
        rdot[:, 0] = flat[:, 1]
        rdot[:, 1] = flat[:, 2]
        return actions, rdot, flat[:, 3].copy(), counts, int(seen)

    def send_results(self, rows) -> int:
        """rows: float32 array (n_robots, n_vals) — one datagram per
        robot that has sent at least one command. Returns datagrams
        sent."""
        import numpy as np

        rows = np.ascontiguousarray(rows, np.float32)
        assert rows.shape[0] == self.n_robots
        return self._lib.router_send_results(
            self._h, rows.ctypes.data_as(ctypes.c_void_p), rows.shape[1]
        )

    def close(self) -> None:
        if self._h:
            self._lib.router_destroy(self._h)
            self._h = None


def send_command(sock: socket.socket, addr, robot_id: int, action: int,
                 vx: float, vy: float = 0.0, wz: float = 0.0) -> None:
    """Client side: send one command packet from `sock` (results come
    back to the same socket — plain UDP request/response)."""
    sock.sendto(
        struct.pack("<IIifff", _CMD_MAGIC, robot_id, action, vx, vy, wz),
        addr,
    )


def recv_result(sock: socket.socket, timeout: float = 1.0):
    """Client side: receive one result row -> (robot_id, [floats]) or
    None on timeout."""
    sock.settimeout(timeout)
    try:
        pkt = sock.recv(65536)
    except socket.timeout:
        return None
    if len(pkt) < 12:
        return None
    magic, rid, n_vals = struct.unpack_from("<III", pkt, 0)
    if magic != _RES_MAGIC or len(pkt) < 12 + 4 * n_vals:
        return None
    vals = struct.unpack_from(f"<{n_vals}f", pkt, 12)
    return rid, list(vals)


class ShmRing:
    """Lock-free SPSC shared-memory ring (native only): zero-copy on-host
    telemetry streaming at control-loop rates."""

    def __init__(self, name: str, capacity: int = 1 << 20, create: bool = True):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native bridge library unavailable")
        self._lib = lib
        self._h = lib.ring_create(name.encode(), capacity, 1 if create else 0)
        if not self._h:
            raise OSError(f"ring_create({name}) failed")

    def push(self, payload: bytes) -> bool:
        return self._lib.ring_push(self._h, payload, len(payload)) == 0

    def pop(self, max_len: int = 65536) -> Optional[bytes]:
        buf = ctypes.create_string_buffer(max_len)
        n = self._lib.ring_pop(self._h, buf, max_len)
        if n <= 0:
            return None
        return buf.raw[:n]

    def close(self) -> None:
        self._lib.ring_destroy(self._h)
        self._h = None
