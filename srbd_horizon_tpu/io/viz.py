"""Trajectory visualization — the RViz-profile replacement (reference
viz.py + launch/SRBD_horizon.rviz, SURVEY.md §2.1 C9/C12).

Renders closed-loop telemetry / plans to SVG (no display server needed) or
matplotlib figures when available: CoM + contact trajectories (the
LINE_STRIP markers), contact forces (the /fc* wrench displays), solve-time
series (/solution_time)."""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import numpy as np


def _svg_polyline(pts, color, width=1.5, opacity=1.0):
    s = " ".join(f"{x:.2f},{y:.2f}" for x, y in pts)
    return (
        f'<polyline points="{s}" fill="none" stroke="{color}" '
        f'stroke-width="{width}" stroke-opacity="{opacity}"/>'
    )


def _project(series, w, h, pad=40):
    """Fit a list of (T,) xy series into the viewport."""
    all_x = np.concatenate([s[:, 0] for s in series])
    all_y = np.concatenate([s[:, 1] for s in series])
    x0, x1 = float(all_x.min()), float(all_x.max())
    y0, y1 = float(all_y.min()), float(all_y.max())
    sx = (w - 2 * pad) / max(x1 - x0, 1e-9)
    sy = (h - 2 * pad) / max(y1 - y0, 1e-9)
    s = min(sx, sy)

    def f(p):
        return (pad + (p[:, 0] - x0) * s, h - pad - (p[:, 1] - y0) * s)

    return f


PALETTE = ["#3366cc", "#dc3912", "#ff9900", "#109618", "#990099", "#0099c6"]


def render_walk_svg(
    path: str,
    telemetry: Dict[str, np.ndarray],
    nc: int = 4,
    state_kind: str = "lip",
    width: int = 900,
    height: int = 500,
) -> None:
    """Top-down (x,y) and side (x,z) views of the CoM and contact
    trajectories from recorded closed-loop states (`telemetry['x']` of
    shape (T, nx))."""
    X = np.asarray(telemetry["x"])
    r = X[:, 0:3]
    c_off = 3 if state_kind == "lip" else 7
    contacts = [X[:, c_off + 3 * i : c_off + 3 * i + 3] for i in range(nc)]

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height * 2}" style="background:#ffffff">'
    ]
    for view, (a, b), label in (
        ("top", (0, 1), "top view (x, y)"),
        ("side", (0, 2), "side view (x, z)"),
    ):
        series = [r[:, [a, b]]] + [c[:, [a, b]] for c in contacts]
        proj = _project(series, width, height)
        y_off = 0 if view == "top" else height
        parts.append(f'<g transform="translate(0,{y_off})">')
        parts.append(
            f'<text x="10" y="20" font-family="sans-serif" font-size="14" '
            f'fill="#333">{label}</text>'
        )
        for idx, s in enumerate(series):
            xs, ys = proj(s)
            pts = list(zip(xs, ys))
            color = "#111111" if idx == 0 else PALETTE[(idx - 1) % len(PALETTE)]
            parts.append(
                _svg_polyline(pts, color, 2.5 if idx == 0 else 1.2,
                              1.0 if idx == 0 else 0.8)
            )
        parts.append("</g>")
    parts.append("</svg>")
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text("\n".join(parts))


def render_matplotlib(
    telemetry: Dict[str, np.ndarray],
    out_path: Optional[str] = None,
    nc: int = 4,
    state_kind: str = "lip",
):
    """Richer diagnostics when matplotlib is available: trajectories,
    forces, solve times, defects."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    X = np.asarray(telemetry["x"])
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    r = X[:, 0:3]
    c_off = 3 if state_kind == "lip" else 7
    axes[0, 0].plot(r[:, 0], r[:, 1], "k-", lw=2, label="CoM")
    for i in range(nc):
        c = X[:, c_off + 3 * i : c_off + 3 * i + 3]
        axes[0, 0].plot(c[:, 0], c[:, 1], lw=1, label=f"c{i}")
    axes[0, 0].set_title("top view")
    axes[0, 0].legend(fontsize=7)
    axes[0, 1].plot(r[:, 2], label="CoM z")
    for i in range(nc):
        axes[0, 1].plot(X[:, c_off + 3 * i + 2], lw=0.8, label=f"c{i} z")
    axes[0, 1].set_title("heights")
    if "solve_time_s" in telemetry:
        axes[1, 0].plot(np.asarray(telemetry["solve_time_s"]) * 1e3)
        axes[1, 0].set_title("solve time [ms]")
    if "defect_norm" in telemetry:
        axes[1, 1].semilogy(np.maximum(np.asarray(telemetry["defect_norm"]), 1e-16))
        axes[1, 1].set_title("defect norm")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return fig
