"""Solver option presets — reconstruction of the reference's missing
`solver_options` module (imported at isrbd_example.py:22 but absent from
the repository, SURVEY.md §2.2 "missing-by-omission"): factory functions
with the same names/roles, returning this framework's option objects.

The reference called:
    solver_options.ipopt_offline_solver_options()        (isrbd:361)
    solver_options.ipopt_online_solver_options(max_iter) (isrbd:401)
    solver_options.sqp_offline_solver_options(ns)        (isrbd:363)
    solver_options.sqp_online_solver_options(max_iterations=1) (isrbd:403)
plus the DDP option dicts built inline (dsrbd_example.py:55-58,
dlip_example.py:57-60)."""

from __future__ import annotations

from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.solvers.alddp import ALOptions


def ddp_example_options() -> DDPOptions:
    """The option set the closed-loop examples pass to DDPSolver
    (dsrbd_example.py:56-58: max_iters=100, alpha_converge_threshold=1e-12,
    beta=1e-3)."""
    return DDPOptions(
        max_iters=100, alpha_converge_threshold=1e-12, beta=1e-3
    )


def ddp_online_options(max_iters: int = 5) -> DDPOptions:
    """Online per-tick budget (launch/SRBD_kangaroo_line_feet.launch:20
    caps online iterations at 5)."""
    return DDPOptions(
        max_iters=max_iters, alpha_converge_threshold=1e-12, beta=1e-3
    )


def ipopt_offline_solver_options() -> tuple[DDPOptions, ALOptions]:
    """Offline full-NLP solve to tight feasibility (the IPOPT seed solve,
    isrbd_example.py:361-369): generous inner iterations, full AL outer
    schedule."""
    return (
        DDPOptions(max_iters=30, alpha_converge_threshold=1e-12, beta=1e-3),
        ALOptions(outer_iters=8, rho0=1e3, tol=1e-6),
    )


def ipopt_online_solver_options(max_iteration: int = 5) -> tuple[DDPOptions, ALOptions]:
    """Online constrained MPC budget (isrbd_example.py:401,
    launch:20 max_iteration=5)."""
    return (
        DDPOptions(
            max_iters=max_iteration, alpha_converge_threshold=1e-12, beta=1e-3
        ),
        ALOptions(outer_iters=1, rho0=1e3),
    )


def sqp_offline_solver_options(ns: int = 20) -> tuple[DDPOptions, ALOptions]:
    """Gauss-Newton SQP offline variant (isrbd_example.py:363)."""
    del ns
    return (
        DDPOptions(max_iters=20, beta=1e-4),
        ALOptions(outer_iters=6, rho0=1e3),
    )


def sqp_online_solver_options(max_iterations: int = 1) -> tuple[DDPOptions, ALOptions]:
    """Single-iteration online SQP (isrbd_example.py:403)."""
    return (
        DDPOptions(max_iters=max_iterations, beta=1e-4),
        ALOptions(outer_iters=1, rho0=1e3),
    )


def al_serving_options(max_iters: int = 15) -> tuple[DDPOptions, ALOptions]:
    """float32 TPU serving configuration for the constrained (AL) path.

    With the equality stack in scaled units (ocp/spec.py::OCP.eq_scale)
    the AL schedule converges at ρ ≤ 1e5, where float32 Cholesky is
    exact enough that the walking-MPC violation trace matches float64
    tick for tick (measured identical to 4 digits over 30 online ticks;
    without scaling f32 needs ρ capped at 1e4 and plateaus ~5× worse,
    and at the unscaled default ρ→1e8 it diverges). Use for fleet-scale
    constrained MPC on TPU; the f64 CPU path can keep the defaults."""
    return (
        DDPOptions(
            max_iters=max_iters, alpha_converge_threshold=1e-12, beta=1e-3
        ),
        ALOptions(outer_iters=6, rho0=1e3, rho_max=1e5, tol=1e-5),
    )
