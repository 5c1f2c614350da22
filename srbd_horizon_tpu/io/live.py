"""Live fleet telemetry view — the operational analog of the reference's
10 Hz RViz streaming loop (dsrbd_example.py:139-149: per-tick marker +
wrench publishing; viz.py:27,37: one publisher per channel).

The reference's operator watches the robot live in RViz; here the fleet
operator watches the serving daemon live: `LiveFleetView.update(tick,
rows)` consumes the same per-robot result rows the daemon fans out over
UDP ([x, y, z, metric, iterations, converged] — examples/serve_fleet.py)
and renders either

  - a TERMINAL dashboard (ANSI redraw when attached to a tty, plain
    append otherwise): fleet aggregates, a unicode sparkline of the
    fleet-max metric history, and a per-robot table; or
  - an auto-refreshing SVG (io/viz.py::render_series_svg panels +
    an x/y fleet scatter), rewritten every `svg_every` ticks — point a
    browser or `watch`-able image viewer at the file.

Headless-testable: rendering returns/writes strings, no curses, no
display required (tests/test_live_view.py drives frames and checks the
output).
"""

from __future__ import annotations

import pathlib
import sys
from collections import deque
from typing import Optional

import numpy as np

_SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values, width: int = 48) -> str:
    """Unicode sparkline of a series, resampled to `width` chars."""
    v = np.asarray(values, float).ravel()
    if v.size == 0:
        return ""
    if v.size > width:
        # max-pool so spikes survive the resampling
        edges = np.linspace(0, v.size, width + 1).astype(int)
        v = np.array([v[a:b].max() if b > a else v[min(a, v.size - 1)]
                      for a, b in zip(edges[:-1], edges[1:])])
    lo, hi = float(v.min()), float(v.max())
    span = max(hi - lo, 1e-300)
    idx = ((v - lo) / span * (len(_SPARK) - 1)).astype(int)
    return "".join(_SPARK[i] for i in idx)


class LiveFleetView:
    """Incremental renderer over the daemon's per-robot result rows."""

    def __init__(
        self,
        n_robots: int,
        mode: str = "term",
        metric_label: str = "cost",
        svg_path: str = "fleet_live.svg",
        svg_every: int = 10,
        history: int = 240,
        max_table_rows: int = 12,
        out=None,
    ):
        if mode not in ("term", "svg"):
            raise ValueError(f"unknown live-view mode {mode!r}")
        self.n_robots = n_robots
        self.mode = mode
        self.metric_label = metric_label
        self.svg_path = svg_path
        self.svg_every = max(1, svg_every)
        self.max_table_rows = max_table_rows
        self.out = out if out is not None else sys.stdout
        self.metric_hist: deque = deque(maxlen=history)
        self.z_hist: deque = deque(maxlen=history)
        self.xy_trails: deque = deque(maxlen=history)
        self._frames = 0

    # ---------- ingestion ----------

    def update(self, tick: int, rows) -> Optional[str]:
        """Consume one tick's (B, 6) result rows; render. Returns the
        rendered text in term mode (also written to `out`)."""
        rows = np.asarray(rows, float)
        self.metric_hist.append(float(rows[:, 3].max()))
        self.z_hist.append((float(rows[:, 2].min()), float(rows[:, 2].max())))
        self.xy_trails.append(rows[:, 0:2].copy())
        self._frames += 1
        if self.mode == "term":
            text = self.render_text(tick, rows)
            if getattr(self.out, "isatty", lambda: False)():
                self.out.write("\x1b[2J\x1b[H")
            self.out.write(text + "\n")
            self.out.flush()
            return text
        if self._frames % self.svg_every == 0:
            self.render_svg(tick, rows)
        return None

    # ---------- terminal ----------

    def render_text(self, tick: int, rows) -> str:
        rows = np.asarray(rows, float)
        B = rows.shape[0]
        conv = int(rows[:, 5].sum())
        z_lo, z_hi = self.z_hist[-1]
        lines = [
            f"fleet @ tick {tick:5d}   robots {B}   "
            f"{self.metric_label}_max {rows[:, 3].max():.3e}   "
            f"itersμ {rows[:, 4].mean():.2f}   conv {conv}/{B}",
            f"  z band [{z_lo:.3f}, {z_hi:.3f}]   "
            f"{self.metric_label} history "
            f"{sparkline(list(self.metric_hist))}",
            f"  {'id':>4} {'x':>8} {'y':>8} {'z':>7} "
            f"{self.metric_label:>11} {'it':>3} {'cv':>2}",
        ]
        for i in range(min(B, self.max_table_rows)):
            r = rows[i]
            lines.append(
                f"  {i:4d} {r[0]:8.3f} {r[1]:8.3f} {r[2]:7.3f} "
                f"{r[3]:11.3e} {int(r[4]):3d} {int(r[5]):2d}"
            )
        if B > self.max_table_rows:
            lines.append(f"  ... +{B - self.max_table_rows} more robots")
        return "\n".join(lines)

    # ---------- svg ----------

    def render_svg(self, tick: int, rows) -> str:
        from srbd_horizon_tpu.io.viz import render_series_svg

        rows = np.asarray(rows, float)
        series = [
            (f"fleet max {self.metric_label}", list(self.metric_hist)),
            ("fleet z_max", [z[1] for z in self.z_hist]),
            ("fleet z_min", [z[0] for z in self.z_hist]),
        ]
        render_series_svg(
            self.svg_path, series,
            title=(f"fleet live — tick {tick}, {rows.shape[0]} robots, "
                   f"conv {int(rows[:, 5].sum())}/{rows.shape[0]}"),
        )
        # append an x/y trail scatter panel into the same file
        svg = pathlib.Path(self.svg_path).read_text()
        trail = np.concatenate(list(self.xy_trails), axis=0)
        pad, w, h = 42, 900, 200
        x, y = trail[:, 0], trail[:, 1]
        sx = max(float(x.max() - x.min()), 1e-6)
        sy = max(float(y.max() - y.min()), 1e-6)
        old_h = int(svg.split('height="')[1].split('"')[0])
        pts = []
        for xi, yi in zip(x[-2000:], y[-2000:]):
            px = pad + (w - 2 * pad) * (xi - x.min()) / sx
            py = old_h + h - 24 - (h - 40) * (yi - y.min()) / sy
            pts.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="1.4" '
                       f'fill="#2563eb" opacity="0.35"/>')
        cur = rows[:, 0:2]
        for xi, yi in cur:
            px = pad + (w - 2 * pad) * (xi - x.min()) / sx
            py = old_h + h - 24 - (h - 40) * (yi - y.min()) / sy
            pts.append(f'<circle cx="{px:.1f}" cy="{py:.1f}" r="3.5" '
                       f'fill="#dc2626"/>')
        label = (f'<text x="{pad}" y="{old_h + 14}" '
                 f'font-family="sans-serif" font-size="11" '
                 f'fill="#444">fleet x/y (trail + current)</text>')
        svg = svg.replace(
            f'height="{old_h}"', f'height="{old_h + h}"', 1
        ).replace("</svg>", label + "\n" + "\n".join(pts) + "\n</svg>")
        pathlib.Path(self.svg_path).write_text(svg)
        return svg
