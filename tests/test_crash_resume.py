"""Crash-resume on the serving surfaces (VERDICT r4 item 4): SIGKILL a
serving process mid-run, restart with --resume, and check the resumed
run continues the snapshot exactly.

The reference's only analog is in-process warm-starting (reference
ddp.py:113-117, isrbd_example.py:423) — state dies with the process.
Here runtime/checkpoint.py snapshots the full fleet state (sim state +
solver plan + parameter pytree + gait phase + progress index); the soak
restores it AFTER its compile-warmup tick, so the resumed tick stream
is bit-continuous with the uninterrupted one (same binary, same inputs,
deterministic XLA CPU) — asserted below by comparing per-window health
lines, not just "it didn't crash".
"""

import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _parse_windows(stderr: str):
    """-> {window_index: (z_min, z_max, defect)} from soak stderr lines."""
    out = {}
    pat = re.compile(
        r"window\s+(\d+):.*z=\[(-?[\d.]+),(-?[\d.]+)\] defect=([\d.e+-]+)"
    )
    for m in pat.finditer(stderr):
        out[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), float(m.group(4))
        )
    return out


def _saved_window(ck: str) -> int:
    """Progress index saved in a soak snapshot (the single scalar leaf);
    -1 if the file doesn't exist or is mid-write."""
    import numpy as np

    try:
        d = np.load(Path(ck).with_suffix(".npz"))
        idx = [d[k] for k in d.files if d[k].shape == ()]
        return int(idx[0]) if idx else -1
    except Exception:
        return -1


def _run_soak(args, timeout=600):
    return subprocess.run(
        [sys.executable, "tools/soak.py", *args],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT,
    )


class TestCrashResumeSoak:
    def test_sigkill_resume_bit_continuity(self, tmp_path):
        ck = str(tmp_path / "fleet_ck")
        common = ["4", "24", "--cpu", "--window", "8"]

        # 1. uninterrupted reference run (no checkpointing)
        ref = _run_soak(common)
        assert ref.returncode == 0, ref.stderr[-800:]
        ref_windows = _parse_windows(ref.stderr)
        assert set(ref_windows) == {0, 1, 2}

        # 2. checkpointing run, SIGKILLed after window 1's snapshot lands
        # (progress tracked by polling the snapshot's saved window index
        # — reading the pipe would block)
        proc = subprocess.Popen(
            [sys.executable, "tools/soak.py", *common, "--checkpoint", ck],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=ROOT,
        )
        deadline = time.time() + 600
        progressed = False
        while time.time() < deadline and proc.poll() is None:
            if _saved_window(ck) >= 2:
                progressed = True
                break
            time.sleep(0.3)
        assert proc.poll() is None and progressed, (
            "soak finished before it could be killed:\n"
            + (proc.stderr.read()[-800:] if proc.poll() is not None else "")
        )
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

        # 3. resume — must restart at window >= 1 and complete
        res = _run_soak([*common, "--checkpoint", ck, "--resume"])
        assert res.returncode == 0, res.stderr[-800:]
        assert "resumed from" in res.stderr
        res_windows = _parse_windows(res.stderr)
        assert res_windows, res.stderr[-800:]
        first = min(res_windows)
        assert first >= 1
        assert max(res_windows) == 2

        # 4. continuity: the resumed windows reproduce the uninterrupted
        # run's window stats (deterministic replay from the snapshot)
        for w in res_windows:
            for a, b in zip(res_windows[w], ref_windows[w]):
                assert abs(a - b) <= 1e-6 + 1e-4 * abs(b), (
                    f"window {w}: resumed {res_windows[w]} != "
                    f"uninterrupted {ref_windows[w]}"
                )


class TestCrashResumeServeFleet:
    def test_daemon_resume_wiring(self, tmp_path):
        """serve_fleet.py --checkpoint/--resume: a killed daemon's fleet
        state restores (tick index + carries) and the selftest still
        passes end-to-end after resume."""
        ck = str(tmp_path / "daemon_ck")
        cmd = [
            sys.executable, "examples/serve_fleet.py", "--cpu",
            "--robots", "4", "--hz", "50", "--selftest",
            "--checkpoint", ck, "--checkpoint-every", "5",
        ]
        # long tick budget: we kill at the FIRST snapshot (~tick 5), long
        # before the daemon could finish on its own
        proc = subprocess.Popen(
            [*cmd, "--ticks", "2000"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=ROOT,
        )
        deadline = time.time() + 600
        killed = False
        while time.time() < deadline and proc.poll() is None:
            if _saved_window(ck) >= 5:
                os.kill(proc.pid, signal.SIGKILL)
                killed = True
                break
            time.sleep(0.3)
        assert killed, (
            "daemon never wrote a checkpoint:\n"
            + (proc.stderr.read()[-800:] if proc.poll() is not None else "")
        )
        proc.wait(timeout=30)

        saved = _saved_window(ck)
        assert saved >= 5
        out = subprocess.run(
            [*cmd, "--ticks", str(saved + 15), "--resume"],
            capture_output=True, text=True, timeout=600, cwd=ROOT,
        )
        assert out.returncode == 0, (out.stdout[-400:], out.stderr[-400:])
        assert "resumed fleet from" in out.stdout
        assert "-> ok" in out.stdout  # selftest passed after resume
