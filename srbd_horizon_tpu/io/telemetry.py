"""Telemetry recording and export — the replacement for the reference's
ROS-topic observability surface (SURVEY.md §5.5):
  /solution_time  (Float32, dsrbd_example.py:45,134-136) → solve_time_s
  /srbd_constraint (WrenchStamped physics residual,
                    dsrbd_example.py:163-175)            → srbd_residual
  /f<frame> per-contact forces (viz.py:29-37)            → forces
  marker trajectories (viz.py:5-27)                      → trajectory export

Collected per tick into host buffers, exported as .npz plus a JSON summary.
For live streaming into external processes, see runtime/bridge.py (the
native IPC bridge)."""

from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, List, Optional

import numpy as np


class TelemetryRecorder:
    """Accumulates per-tick telemetry on host; the MPC loop stays on device
    — only the small TickOutput leaves the chip."""

    def __init__(self):
        self._rows: Dict[str, List[np.ndarray]] = {}
        self._solve_times: List[float] = []
        self._t_last: Optional[float] = None

    def tick_start(self):
        self._t_last = time.perf_counter()

    def record(self, **named_arrays):
        if self._t_last is not None:
            self._solve_times.append(time.perf_counter() - self._t_last)
            self._t_last = None
        for k, v in named_arrays.items():
            self._rows.setdefault(k, []).append(np.asarray(v))

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {k: np.stack(v) for k, v in self._rows.items()}
        if self._solve_times:
            out["solve_time_s"] = np.asarray(self._solve_times)
        return out

    def summary(self) -> Dict:
        arrs = self.arrays()
        s: Dict = {"ticks": len(next(iter(self._rows.values()), []))}
        if "solve_time_s" in arrs:
            st = arrs["solve_time_s"]
            s["solve_time_ms"] = dict(
                p50=float(np.percentile(st, 50) * 1e3),
                p99=float(np.percentile(st, 99) * 1e3),
                mean=float(st.mean() * 1e3),
            )
        if "srbd_residual" in arrs:
            s["srbd_residual_max"] = float(np.abs(arrs["srbd_residual"]).max())
        if "defect_norm" in arrs:
            s["defect_norm_max"] = float(arrs["defect_norm"].max())
        if "cost" in arrs:
            s["cost_final"] = float(np.asarray(arrs["cost"])[-1].mean())
        return s

    def save(self, path: str) -> None:
        path = pathlib.Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path.with_suffix(".npz"), **self.arrays())
        path.with_suffix(".json").write_text(json.dumps(self.summary(), indent=2))


def export_trajectory_json(path: str, solution: Dict[str, np.ndarray],
                           dt: float) -> None:
    """Trajectory dump for external visualization — the role of the RViz
    LINE_STRIP markers (viz.py:5-27) without a ROS dependency."""
    out = {
        "dt": dt,
        "series": {
            k: np.asarray(v).tolist()
            for k, v in solution.items()
            if k not in ("x_opt", "u_opt")
        },
    }
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out))
