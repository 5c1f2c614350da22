"""Live fleet telemetry view (io/live.py) — headless frame-driving tests
for the 10 Hz RViz-loop analog (reference dsrbd_example.py:139-149).
Plus the daemon wiring: serve_fleet.py --viz svg produces a moving live
file during a selftest run."""

import io
import subprocess
import sys
from pathlib import Path

import numpy as np

from srbd_horizon_tpu.io.live import LiveFleetView, sparkline

ROOT = Path(__file__).resolve().parents[1]


def _rows(B, t):
    rng = np.random.default_rng(t)
    rows = np.zeros((B, 6), np.float32)
    rows[:, 0] = 0.1 * t + 0.01 * rng.standard_normal(B)   # x advances
    rows[:, 1] = 0.01 * rng.standard_normal(B)
    rows[:, 2] = 0.88 + 0.002 * rng.standard_normal(B)
    rows[:, 3] = 1e-3 * (1 + 0.2 * np.sin(t / 3.0))        # metric
    rows[:, 4] = 2
    rows[:, 5] = 1
    return rows


class TestSparkline:
    def test_shapes_and_resampling(self):
        assert sparkline([]) == ""
        s = sparkline(np.linspace(0, 1, 10))
        assert len(s) == 10
        assert s[0] == "▁" and s[-1] == "█"
        # longer-than-width series resample with max-pooling: a single
        # spike survives
        v = np.zeros(500)
        v[250] = 1.0
        assert "█" in sparkline(v, width=40)


class TestTermView:
    def test_frames(self):
        out = io.StringIO()
        view = LiveFleetView(6, mode="term", metric_label="viol", out=out)
        for t in range(5):
            text = view.update(t, _rows(6, t))
        assert "fleet @ tick     4" in text
        assert "viol_max" in text and "conv 6/6" in text
        assert "z band" in text
        # per-robot table rows present
        assert text.count("\n") >= 6
        # all five frames written to the stream
        assert out.getvalue().count("fleet @ tick") == 5

    def test_table_truncates(self):
        view = LiveFleetView(40, mode="term", out=io.StringIO(),
                             max_table_rows=8)
        text = view.update(0, _rows(40, 0))
        assert "+32 more robots" in text


class TestSvgView:
    def test_moving_file(self, tmp_path):
        path = str(tmp_path / "live.svg")
        view = LiveFleetView(4, mode="svg", svg_path=path, svg_every=3,
                             metric_label="cost")
        for t in range(3):
            view.update(t, _rows(4, t))
        svg1 = Path(path).read_text()
        assert "<svg" in svg1 and "fleet live — tick 2" in svg1
        assert "fleet x/y" in svg1 and "circle" in svg1
        for t in range(3, 6):
            view.update(t, _rows(4, t))
        svg2 = Path(path).read_text()
        assert "tick 5" in svg2
        assert svg2 != svg1  # the file actually moves


class TestDaemonViz:
    def test_serve_fleet_viz_svg(self, tmp_path):
        path = str(tmp_path / "daemon_live.svg")
        out = subprocess.run(
            [sys.executable, "examples/serve_fleet.py", "--cpu",
             "--robots", "4", "--ticks", "12", "--hz", "50",
             "--selftest", "--viz", "svg", "--viz-path", path],
            capture_output=True, text=True, timeout=600, cwd=ROOT,
        )
        assert out.returncode == 0, (out.stdout[-400:], out.stderr[-400:])
        svg = Path(path).read_text()
        assert "fleet live" in svg and "4 robots" in svg
