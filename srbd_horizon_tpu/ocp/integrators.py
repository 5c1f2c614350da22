"""Fixed-step integrators as step-function factories.

Reference parity:
  - EULER: the DDP path discretizes the ODE with one explicit Euler step per
    node (ddp.py:228-230), and the closed-loop simulation uses the same
    integrator (dsrbd_example.py:76,159).
  - RK2: the NLP path's multiple-shooting transcription uses RK2
    (prb.py:113, isrbd_example.py:135). Horizon's RK2 is the explicit
    midpoint method.

Each factory takes a continuous dynamics `xdot(x, u, p)` and returns a
discrete step `step(x, u, p, dt)`. All returned functions are jittable and
vmap/scan-compatible.
"""

from __future__ import annotations


def euler(xdot_fn):
    """x⁺ = x + dt ẋ(x, u) — ddp.py:228-230."""

    def step(x, u, p, dt):
        return x + dt * xdot_fn(x, u, p)

    return step


def rk2(xdot_fn):
    """Explicit midpoint: k1 = ẋ(x,u); x⁺ = x + dt ẋ(x + dt/2 k1, u)."""

    def step(x, u, p, dt):
        k1 = xdot_fn(x, u, p)
        return x + dt * xdot_fn(x + 0.5 * dt * k1, u, p)

    return step


def rk4(xdot_fn):
    """Classic RK4 — provisioned beyond the reference (Horizon also ships
    RK4; the reference never selects it)."""

    def step(x, u, p, dt):
        k1 = xdot_fn(x, u, p)
        k2 = xdot_fn(x + 0.5 * dt * k1, u, p)
        k3 = xdot_fn(x + 0.5 * dt * k2, u, p)
        k4 = xdot_fn(x + dt * k3, u, p)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    return step


BY_NAME = {"EULER": euler, "RK2": rk2, "RK4": rk4}
