#!/usr/bin/env python
"""Teleop command sender — the joystick/keyboard input role of the
reference (dsrbd_example.py:49,86-99: /joy buttons select standing /
walking / jumping and axes set the CoM velocity reference).

Sends JSON {vx, vy, action} datagrams on topic "teleop" to an example
running with --teleop-port. Interactive stdin loop:
    w/s : +/- vx      a/d : +/- vy
    0/1/2 : stance / step / jump      q : quit
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from srbd_horizon_tpu.runtime.bridge import Publisher


def main(port: int = 47400):
    pub = Publisher("127.0.0.1", port)
    vx = vy = 0.0
    action = 0
    print(__doc__)
    while True:
        try:
            line = input(f"vx={vx:+.2f} vy={vy:+.2f} action={action} > ")
        except EOFError:
            break
        for ch in line.strip():
            if ch == "w":
                vx += 0.1
            elif ch == "s":
                vx -= 0.1
            elif ch == "a":
                vy += 0.1
            elif ch == "d":
                vy -= 0.1
            elif ch in "012":
                action = int(ch)
            elif ch == "q":
                return
        pub.publish_json(
            "teleop", {"vx": vx, "vy": vy, "action": action}
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 47400)
