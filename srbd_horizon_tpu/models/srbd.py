"""Single Rigid Body Dynamics (SRBD) — Newton–Euler equations for a floating
rigid body under point contact forces.

Re-implements the capability of Horizon's `kin_dyn.fSRBD` / `kin_dyn.SRBD`
(used at reference prb.py:99, dsrbd_example.py:167, isrbd_example.py:344)
as pure JAX functions over stacked contact arrays — contacts are a leading
array axis (nc, 3) instead of the reference's Python dicts of symbols, so the
model vmaps over contacts, nodes, and scenarios with no Python loops.

Equations (isrbd_example.py:332-334 documents the residual form):
    m (r̈ - g) - Σᵢ fᵢ = 0
    I ω̇ + ω × I ω - Σᵢ (cᵢ - r) × fᵢ = 0
with g = (0, 0, -9.81). The reference applies `force_scaling = 1000`
(prb.py:98-99): the OCP's force variables are in kN, and mass/inertia are
scaled by 1/1000 inside the dynamics so the equations are unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from srbd_horizon_tpu.math.quat import (
    quat_derivative_world,
    quat_to_rot,
    solve3x3,
)

GRAVITY = 9.81


def gravity_vec(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, -GRAVITY], dtype=dtype)


def f_srbd(m, inertia_world, forces, r, contacts, w):
    """Forward SRBD: accelerations from forces (Horizon `kin_dyn.fSRBD`,
    reference prb.py:99).

    Args:
      m: scalar mass (already divided by force_scaling when forces are scaled).
      inertia_world: (3,3) rotational inertia expressed in world frame —
        the caller supplies R (I/fs) Rᵀ exactly as prb.py:99.
      forces: (nc, 3) contact forces.
      r: (3,) CoM position.
      contacts: (nc, 3) contact positions.
      w: (3,) base angular velocity (world-aligned).

    Returns:
      (rddot (3,), wdot (3,)).
    """
    g = gravity_vec(forces.dtype)
    f_tot = jnp.sum(forces, axis=0)
    rddot = f_tot / m + g

    torque = jnp.sum(jnp.cross(contacts - r[None, :], forces), axis=0)
    Iw = inertia_world @ w
    wdot = solve3x3(inertia_world, torque - jnp.cross(w, Iw))
    return rddot, wdot


def srbd_residual(m, inertia_world, forces, r, rddot, contacts, w, wdot):
    """Newton–Euler residual (Horizon `kin_dyn.SRBD`): 6-vector that is zero
    when (rddot, wdot) are dynamically consistent with the applied forces.
    Used as the hybrid-model constraint (isrbd_example.py:344,347) and as the
    runtime physics-fidelity oracle (dsrbd_example.py:163-175)."""
    g = gravity_vec(forces.dtype)
    lin = m * (rddot - g) - jnp.sum(forces, axis=0)
    Iw = inertia_world @ w
    ang = (
        inertia_world @ wdot
        + jnp.cross(w, Iw)
        - jnp.sum(jnp.cross(contacts - r[None, :], forces), axis=0)
    )
    return jnp.concatenate([lin, ang])


def world_inertia(inertia_body, o):
    """R(o) I R(o)ᵀ — centroidal inertia rotated to world (prb.py:99)."""
    R = quat_to_rot(o)
    return R @ inertia_body @ R.T


def srbd_xdot(state, inputs, constants):
    """Continuous-time SRBD state derivative — the reference's
    `double_integrator_with_floating_base` with fSRBD accelerations plugged
    into the base rows (prb.py:104-109).

    State layout (prb.py:32-59, nc contacts):
        [ r(3), o(4 xyzw), c_0..c_{nc-1}(3 each),
          rdot(3), w(3), cdot_0..cdot_{nc-1}(3 each) ]      nx = 13 + 6 nc
    Input layout (prb.py:66-68, creation order cddot_i then f_i per contact):
        [ cddot_0(3), f_0(3), ..., cddot_{nc-1}(3), f_{nc-1}(3) ]  nu = 6 nc

    `constants` is a dict with 'm_scaled' (m / force_scaling) and
    'inertia_scaled' ((3,3) I / force_scaling); forces are in
    force-scaling units (kN), matching prb.py:98-99.
    """
    nc = (state.shape[-1] - 13) // 6
    r = state[0:3]
    o = state[3:7]
    c = state[7 : 7 + 3 * nc].reshape(nc, 3)
    rdot = state[7 + 3 * nc : 10 + 3 * nc]
    w = state[10 + 3 * nc : 13 + 3 * nc]
    cdot = state[13 + 3 * nc : 13 + 6 * nc].reshape(nc, 3)

    ui = inputs.reshape(nc, 6)
    cddot = ui[:, 0:3]
    f = ui[:, 3:6]

    I_world = world_inertia(constants["inertia_scaled"], o)
    rddot, wdot = f_srbd(constants["m_scaled"], I_world, f, r, c, w)
    odot = quat_derivative_world(o, w)

    return jnp.concatenate(
        [rdot, odot, cdot.reshape(-1), rddot, wdot, cddot.reshape(-1)]
    )


def split_srbd_state(state, nc):
    """Named view of an SRBD state vector (or batch thereof along axis -1)."""
    return dict(
        r=state[..., 0:3],
        o=state[..., 3:7],
        c=state[..., 7 : 7 + 3 * nc].reshape(*state.shape[:-1], nc, 3),
        rdot=state[..., 7 + 3 * nc : 10 + 3 * nc],
        w=state[..., 10 + 3 * nc : 13 + 3 * nc],
        cdot=state[..., 13 + 3 * nc : 13 + 6 * nc].reshape(
            *state.shape[:-1], nc, 3
        ),
    )


def split_srbd_input(inputs, nc):
    ui = inputs.reshape(*inputs.shape[:-1], nc, 6)
    return dict(cddot=ui[..., 0:3], f=ui[..., 3:6])
