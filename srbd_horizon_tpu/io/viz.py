"""Trajectory + force visualization — the RViz-profile replacement
(reference viz.py + launch/SRBD_horizon.rviz, SURVEY.md §2.1 C9/C12).

Renders closed-loop telemetry / plans to SVG (no display server needed) or
matplotlib figures when available:
  - CoM + contact trajectories (the LINE_STRIP markers, viz.py:5-27)
  - per-contact ground-reaction forces: time series + arrows anchored at
    the contact points (the per-contact WrenchStamped publications on
    /fc0../fc7, reference viz.py:29-37, provisioned as 8 wrench displays
    in launch/SRBD_horizon.rviz:156-261)
  - the base inertia ellipsoid at the final CoM (the SRBDViewer sphere
    marker, reference viz.py:39-77; axis i spans the sum of the other two
    inertia diagonal entries over the trace, viz.py:50-53 — here
    normalized to a readable footprint instead of raw kg·m² as meters)
  - solve-time series (/solution_time) and shooting-defect series
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import numpy as np


def extract_contact_forces(
    u0: np.ndarray, nc: int, input_kind: str = "srbd",
    force_scaling: float = 1000.0,
) -> Optional[np.ndarray]:
    """(T, nu) applied inputs -> (T, nc, 3) contact forces in newtons.

    SRBD input layout: (cddot_i(3), f_i(3)) interleaved (prb.py:66-68),
    forces stored in scaled units (prb.py:98-99 divides m and I by
    force_scaling, so the physical force is f·force_scaling).
    ISRBD input layout: (rddot(3), wdot(3), then (cddot_i, f_i) per
    contact), forces UNSCALED (isrbd_example.py:336-344).
    LIP has no contact forces (ZMP input only) -> None (the reference
    publishes placeholder constant forces there, dlip_example.py:149)."""
    u0 = np.asarray(u0)
    if input_kind == "srbd":
        f = u0[:, : 6 * nc].reshape(u0.shape[0], nc, 6)[:, :, 3:6]
        return f * force_scaling
    if input_kind == "isrbd":
        f = u0[:, 6 : 6 + 6 * nc].reshape(u0.shape[0], nc, 6)[:, :, 3:6]
        return f
    return None


def _inertia_ellipsoid_radii(inertia) -> np.ndarray:
    """SRBDViewer axis rule (reference viz.py:50-53): axis i of the
    rendered ellipsoid is 0.5·(sum of the OTHER two inertia diagonal
    entries)/trace — inertia about an axis measures mass spread in the
    orthogonal plane, so a pancake body (large Izz) must render flat in
    z. Returned radii are normalized so the largest is 1; callers apply
    their own absolute footprint scale."""
    I3 = np.asarray(inertia, float).ravel()[:3]
    tr = max(float(I3.sum()), 1e-12)
    rw = 0.5 * np.array([I3[2] + I3[1], I3[2] + I3[0], I3[0] + I3[1]]) / tr
    return rw / max(float(rw.max()), 1e-12)


def _svg_polyline(pts, color, width=1.5, opacity=1.0):
    s = " ".join(f"{x:.2f},{y:.2f}" for x, y in pts)
    return (
        f'<polyline points="{s}" fill="none" stroke="{color}" '
        f'stroke-width="{width}" stroke-opacity="{opacity}"/>'
    )


def _svg_arrow(x0, y0, x1, y1, color, width=1.2, opacity=0.9):
    """Line segment with a small arrowhead at (x1, y1)."""
    dx, dy = x1 - x0, y1 - y0
    n = max((dx * dx + dy * dy) ** 0.5, 1e-9)
    ux, uy = dx / n, dy / n
    hx, hy = x1 - 4 * ux, y1 - 4 * uy
    px, py = -uy, ux
    head = (
        f'<polygon points="{x1:.2f},{y1:.2f} {hx + 2 * px:.2f},'
        f'{hy + 2 * py:.2f} {hx - 2 * px:.2f},{hy - 2 * py:.2f}" '
        f'fill="{color}" fill-opacity="{opacity}"/>'
    )
    line = (
        f'<line x1="{x0:.2f}" y1="{y0:.2f}" x2="{x1:.2f}" y2="{y1:.2f}" '
        f'stroke="{color}" stroke-width="{width}" stroke-opacity="{opacity}"/>'
    )
    return line + head


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
    force_scaling: float = 1000.0,
    n_force_arrows: int = 16,
    inertia: Optional[np.ndarray] = None,
) -> None:
    """Top-down (x,y) and side (x,z) views of the CoM and contact
    trajectories from recorded closed-loop states (`telemetry['x']` of
    shape (T, nx)); when applied inputs (`telemetry['u0']`) are present
    for a force-bearing model, adds per-contact force arrows on the views
    and a vertical-force time-series panel (the /fc* wrench displays,
    reference viz.py:29-37). `inertia` (3,) diagonal draws the base
    inertia ellipsoid at the final CoM (the SRBDViewer marker,
    reference viz.py:39-77)."""
    X = np.asarray(telemetry["x"])
    r = X[:, 0:3]
    c_off = 3 if state_kind == "lip" else 7
    contacts = [X[:, c_off + 3 * i : c_off + 3 * i + 3] for i in range(nc)]

    forces = None
    if "u0" in telemetry and state_kind in ("srbd", "isrbd"):
        forces = extract_contact_forces(
            telemetry["u0"], nc, input_kind=state_kind,
            force_scaling=force_scaling,
        )
    force_panel = height * 3 // 5 if forces is not None else 0

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height * 2 + force_panel}" style="background:#ffffff">'
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
        if forces is not None:
            # force arrows anchored at the contact point, sampled along
            # the episode; arrow length ∝ force component in this view
            T = forces.shape[0]
            f_max = max(float(np.abs(forces).max()), 1e-9)
            arrow_px = 60.0  # pixels for the largest force
            ticks = np.linspace(0, T - 1, min(n_force_arrows, T)).astype(int)
            for i in range(nc):
                color = PALETTE[i % len(PALETTE)]
                xs, ys = proj(contacts[i][:, [a, b]])
                for t in ticks:
                    fa, fb = forces[t, i, a], forces[t, i, b]
                    if abs(fa) + abs(fb) < 1e-6:
                        continue
                    x0p, y0p = xs[t], ys[t]
                    parts.append(_svg_arrow(
                        x0p, y0p,
                        x0p + fa / f_max * arrow_px,
                        y0p - fb / f_max * arrow_px,
                        color,
                    ))
        if inertia is not None:
            # inertia ellipsoid at the final CoM (SRBDViewer, reference
            # viz.py:50-53): axis i scales with the sum of the OTHER two
            # diagonal entries over the trace (a flat body with large Izz
            # renders as a pancake, not a z-spike), normalized so the
            # largest axis spans 0.3 m
            rw = 0.3 * _inertia_ellipsoid_radii(inertia)
            cxy = r[-1]
            ref = np.array([
                [cxy[a], cxy[b]],
                [cxy[a] + rw[a], cxy[b] + rw[b]],
            ])
            (exs, eys) = proj(ref)
            rx_px = abs(exs[1] - exs[0])
            ry_px = abs(eys[1] - eys[0])
            parts.append(
                f'<ellipse cx="{exs[0]:.2f}" cy="{eys[0]:.2f}" '
                f'rx="{max(rx_px, 1.0):.2f}" ry="{max(ry_px, 1.0):.2f}" '
                f'fill="#888888" fill-opacity="0.25" stroke="#555555"/>'
            )
        parts.append("</g>")

    if forces is not None:
        # vertical-force time series: force transfer through the gait
        T = forces.shape[0]
        fz_max = max(float(forces[:, :, 2].max()), 1e-9)
        pw, ph, pad = width, force_panel, 30
        parts.append(f'<g transform="translate(0,{height * 2})">')
        parts.append(
            f'<text x="10" y="16" font-family="sans-serif" font-size="14" '
            f'fill="#333">contact normal forces fz [N] (max {fz_max:.0f})</text>'
        )
        for i in range(nc):
            fz = forces[:, i, 2]
            xs = pad + np.arange(T) * (pw - 2 * pad) / max(T - 1, 1)
            ys = ph - pad - fz / fz_max * (ph - 2 * pad)
            parts.append(_svg_polyline(
                list(zip(xs, ys)), PALETTE[i % len(PALETTE)], 1.4
            ))
        # zero line
        y0l = ph - pad
        parts.append(
            f'<line x1="{pad}" y1="{y0l:.1f}" x2="{pw - pad}" y2="{y0l:.1f}" '
            f'stroke="#999" stroke-width="0.7" stroke-dasharray="4,3"/>'
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
    force_scaling: float = 1000.0,
    inertia: Optional[np.ndarray] = None,
):
    """Richer diagnostics when matplotlib is available: trajectories,
    per-contact forces (series + top-view quiver), solve times, defects,
    and the base inertia ellipsoid at the final CoM when `inertia` (3,)
    is given (the SRBDViewer marker, reference viz.py:39-77)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    X = np.asarray(telemetry["x"])
    forces = None
    if "u0" in telemetry and state_kind in ("srbd", "isrbd"):
        forces = extract_contact_forces(
            telemetry["u0"], nc, input_kind=state_kind,
            force_scaling=force_scaling,
        )
    n_rows = 3 if forces is not None else 2
    fig, axes = plt.subplots(n_rows, 2, figsize=(12, 4 * n_rows))
    r = X[:, 0:3]
    c_off = 3 if state_kind == "lip" else 7
    axes[0, 0].plot(r[:, 0], r[:, 1], "k-", lw=2, label="CoM")
    for i in range(nc):
        c = X[:, c_off + 3 * i : c_off + 3 * i + 3]
        axes[0, 0].plot(c[:, 0], c[:, 1], lw=1, label=f"c{i}")
    if inertia is not None:
        from matplotlib.patches import Ellipse

        # SRBDViewer axis rule (reference viz.py:50-53) — see
        # _inertia_ellipsoid_radii
        rw = 0.3 * _inertia_ellipsoid_radii(inertia)
        axes[0, 0].add_patch(Ellipse(
            (r[-1, 0], r[-1, 1]), 2 * rw[0], 2 * rw[1],
            facecolor="#888888", alpha=0.3, edgecolor="#555555",
        ))
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
    if forces is not None:
        # per-contact vertical force: the gait's force transfer
        for i in range(nc):
            axes[2, 0].plot(forces[:, i, 2], lw=1.2, label=f"fz{i}")
        axes[2, 0].axhline(0.0, color="#999", lw=0.7, ls="--")
        axes[2, 0].set_title("contact normal forces fz [N] (/fc* role)")
        axes[2, 0].legend(fontsize=7)
        # top-view force quiver at sampled contact points
        T = forces.shape[0]
        ticks = np.linspace(0, T - 1, min(16, T)).astype(int)
        for i in range(nc):
            c = X[:, c_off + 3 * i : c_off + 3 * i + 3]
            axes[2, 1].plot(c[:, 0], c[:, 1], lw=0.8)
            axes[2, 1].quiver(
                c[ticks, 0], c[ticks, 1],
                forces[ticks, i, 0], forces[ticks, i, 1],
                angles="xy", width=0.003,
            )
        axes[2, 1].set_title("tangential forces (top view)")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return fig


def render_series_svg(
    path: str,
    series,
    title: str = "",
    width: int = 900,
    panel_height: int = 160,
) -> None:
    """Generic stacked time-series panels (one per (label, values) pair),
    each with its own y-scale and min/max annotations — the quick-look
    renderer for user-defined problems (the /solution_time-style scalar
    telemetry role, dsrbd_example.py:45,134-136) without requiring the
    walking-telemetry schema render_walk_svg expects."""
    pad = 42
    n = len(series)
    height = 30 + n * panel_height
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" style="background:#ffffff">'
    ]
    if title:
        parts.append(
            f'<text x="{width / 2:.0f}" y="18" text-anchor="middle" '
            f'font-family="sans-serif" font-size="13">{title}</text>'
        )
    for i, (label, vals) in enumerate(series):
        v = np.asarray(vals, float).ravel()
        top = 30 + i * panel_height
        bot = top + panel_height - 24
        v0, v1 = float(v.min()), float(v.max())
        span = max(v1 - v0, 1e-12)
        xs = pad + (width - 2 * pad) * np.arange(v.size) / max(v.size - 1, 1)
        ys = bot - (bot - top - 14) * (v - v0) / span
        color = PALETTE[i % len(PALETTE)]
        parts.append(
            f'<rect x="{pad}" y="{top}" width="{width - 2 * pad}" '
            f'height="{bot - top}" fill="none" stroke="#ddd"/>'
        )
        if v0 < 0.0 < v1:
            yz = bot - (bot - top - 14) * (0.0 - v0) / span
            parts.append(
                f'<line x1="{pad}" y1="{yz:.2f}" x2="{width - pad}" '
                f'y2="{yz:.2f}" stroke="#bbb" stroke-dasharray="4,3"/>'
            )
        parts.append(_svg_polyline(list(zip(xs, ys)), color))
        parts.append(
            f'<text x="{pad}" y="{top + 12}" font-family="sans-serif" '
            f'font-size="11" fill="{color}">{label}  '
            f'[{v0:.3g}, {v1:.3g}]</text>'
        )
    parts.append("</svg>")
    pathlib.Path(path).write_text("\n".join(parts))
