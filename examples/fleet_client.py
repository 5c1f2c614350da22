#!/usr/bin/env python
"""Simulated robot client for the fleet serving daemon
(examples/serve_fleet.py): sends command packets at 10 Hz, prints the
result rows it gets back. One process per robot — the shape of a real
deployment where each robot's onboard computer talks UDP to the fleet
controller.

Usage: python examples/fleet_client.py <port> <robot_id> [vx] [vy]
"""

import pathlib
import socket
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from srbd_horizon_tpu.runtime.bridge import recv_result, send_command


def main():
    port = int(sys.argv[1])
    rid = int(sys.argv[2])
    vx = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    vy = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    addr = ("127.0.0.1", port)
    print(f"robot {rid}: commanding vx={vx} vy={vy} to udp:{port}")
    try:
        while True:
            send_command(sock, addr, rid, action=1, vx=vx, vy=vy)
            res = recv_result(sock, timeout=0.5)
            if res is not None and res[0] == rid:
                x, y, z, cost, iters, conv = res[1][:6]
                print(f"robot {rid}: com=({x:+.3f},{y:+.3f},{z:.3f}) "
                      f"cost={cost:.1f} iters={iters:.0f} conv={conv:.0f}",
                      flush=True)
            time.sleep(0.1)
    except KeyboardInterrupt:
        pass
    finally:
        sock.close()


if __name__ == "__main__":
    main()
