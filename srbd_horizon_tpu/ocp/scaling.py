"""Automatic equality-row equilibration — the framework-side analog of
IPOPT's gradient-based NLP scaling (`nlp_scaling_method=gradient-based`),
which the reference leans on implicitly whenever it hands the isrbd NLP
to IPOPT (isrbd_example.py:361-369).

Why it exists: the equality stacks of a whole-body OCP mix units —
Newton–Euler rows are in newtons (gradients O(m) from the rddot columns
and O(|f|) from the torque levers) while contact-height rows are in
meters (gradients O(1)). One augmented-Lagrangian penalty ρ is then
simultaneously far too stiff for the force rows and too soft for the
geometric ones; the unscaled stack only converges at ρ→1e8, where the
inner Quu condition (~1e13) is f64-only. `OCP.eq_scale` fixes this with
a hand-built per-row scale (problems/isrbd.py); this module derives the
same thing automatically so user-defined problems (docs/CUSTOM_PROBLEMS.md)
get f32-safe constrained serving without manual unit analysis.

Method (Jacobi row equilibration, IPOPT's rule): for each equality row j,
    s_j = min(1, target / max_n ‖∇_{x,u} h_j(x̂, û, p_n)‖_∞)
evaluated at a nominal point (x̂, û) across every node's parameter row —
node masks (the hybrid SRBD/LIP schedule) zero different rows at
different nodes, so the max over nodes sees each row where it is active.
Rows are only ever scaled DOWN (s_j ≤ 1, IPOPT's convention): a row with
a tiny gradient at the nominal point is left alone rather than blown up
on the strength of one linearization. Rows identically zero at the
nominal point get s_j = 1.

The result is static metadata computed once at build time (host-side,
outside jit) — exactly like the hand-built vector it replaces.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from srbd_horizon_tpu.ocp.spec import OCP


def eq_row_gradient_norms(ocp: OCP, x0, u0=None, params=None):
    """Per-row ∞-norms of the equality-stack Jacobians at the nominal
    point, maxed over nodes: (stage (n_eq,), terminal (n_eq_T,)).
    Exposed separately from `auto_eq_scale` for diagnostics/tests."""
    params = ocp.params if params is None else params
    x0 = jnp.asarray(x0)
    u0 = jnp.zeros((ocp.nu,), x0.dtype) if u0 is None else jnp.asarray(u0)

    def stage_norms(p):
        J = jax.jacfwd(
            lambda xu: ocp.stage_eq(xu[: ocp.nx], xu[ocp.nx:], p)
        )(jnp.concatenate([x0, u0]))
        return jnp.max(jnp.abs(J), axis=1)

    p_stage = {k: v[: ocp.ns] for k, v in params.items()}
    rn = jnp.max(jax.vmap(stage_norms)(p_stage), axis=0)

    p_term = {k: v[ocp.ns] for k, v in params.items()}
    J_T = jax.jacfwd(lambda x: ocp.terminal_eq(x, p_term))(x0)
    rn_T = jnp.max(jnp.abs(J_T), axis=1)
    return rn, rn_T


def eq_row_u_gradient_norms(ocp: OCP, x0, u0=None, params=None):
    """Per-stage-row ∞-norms of ∂h/∂u alone, maxed over nodes — the
    state-only-row detector: a row with zero u-gradient at every node
    never enters Quu and can carry a much stiffer AL penalty (see
    OCP.eq_rho_weight)."""
    params = ocp.params if params is None else params
    x0 = jnp.asarray(x0)
    u0 = jnp.zeros((ocp.nu,), x0.dtype) if u0 is None else jnp.asarray(u0)

    def stage_norms(p):
        Ju = jax.jacfwd(lambda u: ocp.stage_eq(x0, u, p))(u0)
        return jnp.max(jnp.abs(Ju), axis=1)

    p_stage = {k: v[: ocp.ns] for k, v in params.items()}
    return jnp.max(jax.vmap(stage_norms)(p_stage), axis=0)


def auto_eq_scale(
    ocp: OCP, x0, u0=None, params=None, target: float = 1.0,
    state_row_stiffness: float = 0.0,
) -> OCP:
    """Return the OCP with `eq_scale`/`eq_scale_T` derived by Jacobi row
    equilibration at (x0, u0) — see the module docstring. `target` is
    the gradient ∞-norm every row is scaled down to (IPOPT's `100` is an
    interior-point artifact; 1.0 puts all rows in O(1) comparable units,
    matching the shipped hand scales). No-op rows keep scale 1.

    `state_row_stiffness` > 0 additionally derives `eq_rho_weight`:
    stage rows whose u-gradient is identically zero at the nominal point
    (state-only rows — their AL penalty bypasses Quu, see
    OCP.eq_rho_weight) and every terminal row (terminal nodes have no
    input) get that penalty-stiffness multiplier; input-touching rows
    keep 1. The shipped isrbd problem uses 100-400 on its state-only
    rows; 100 is a safe automatic choice (the windup ceiling measured
    ~900)."""
    if ocp.stage_eq(
        jnp.zeros(ocp.nx), jnp.zeros(ocp.nu),
        {k: v[0] for k, v in ocp.params.items()},
    ).shape[0] == 0 and ocp.terminal_eq(
        jnp.zeros(ocp.nx), {k: v[0] for k, v in ocp.params.items()}
    ).shape[0] == 0:
        return ocp
    rn, rn_T = eq_row_gradient_norms(ocp, x0, u0, params)

    def scales(r):
        return jnp.where(r > target, target / r, 1.0)

    out = dataclasses.replace(
        ocp, eq_scale=scales(rn), eq_scale_T=scales(rn_T)
    )
    if state_row_stiffness > 0.0:
        run = eq_row_u_gradient_norms(ocp, x0, u0, params)
        w = jnp.where(run == 0.0, state_row_stiffness, 1.0)
        w_T = jnp.full(rn_T.shape, state_row_stiffness, rn_T.dtype)
        out = dataclasses.replace(
            out, eq_rho_weight=w, eq_rho_weight_T=w_T
        )
    return out
