"""Tracing / profiling hooks — the observability the reference lacks
(SURVEY.md §5.1: its only instrumentation is ttictoc around solve(),
dsrbd_example.py:134-136; "log everything in DDP" is an open TODO,
README.md:3).

Three layers:
  - `solve_timer`: lightweight wall-clock timing of jitted calls with
    correct device synchronization (the /solution_time analog).
  - `trace`: context manager around jax.profiler for on-device traces
    (viewable in TensorBoard / Perfetto) — kernel-level visibility the
    reference never had.
  - `iteration_log`: structured per-solve telemetry (iterations, cost,
    defects) pulled from DDPSolution — "log everything in DDP", done.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax
import numpy as np


class SolveTimer:
    """Wall-clock stats for repeated jitted calls (p50/p99/mean)."""

    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def measure(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        # caller is responsible for block_until_ready on its outputs
        self.samples.append(time.perf_counter() - t0)

    def timed(self, fn):
        """Wrap a jitted fn so each call is timed with a device sync."""

        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            self.samples.append(time.perf_counter() - t0)
            return out

        return wrapper

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = np.asarray(self.samples) * 1e3
        return dict(
            p50_ms=float(np.percentile(s, 50)),
            p99_ms=float(np.percentile(s, 99)),
            mean_ms=float(s.mean()),
            n=len(self.samples),
        )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/srbd_trace") -> Iterator[None]:
    """On-device profiler trace (XLA/TPU kernel timeline)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def iteration_log(sol, prefix: str = "ddp") -> Dict[str, float]:
    """Structured solve telemetry from a DDPSolution (batched or not)."""
    it = np.asarray(sol.iterations)
    cost = np.asarray(sol.cost)
    defect = np.asarray(sol.defect_norm)
    conv = np.asarray(sol.converged)
    return {
        f"{prefix}.iterations_mean": float(it.mean()),
        f"{prefix}.iterations_max": int(it.max()),
        f"{prefix}.cost_mean": float(cost.mean()),
        f"{prefix}.defect_max": float(defect.max()),
        f"{prefix}.converged_frac": float(np.mean(conv.astype(np.float64))),
    }
