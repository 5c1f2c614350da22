"""Linear Inverted Pendulum (LIP) model.

Reference dynamics (prb.py:317-319):
    η² = 9.81 / 0.88
    r̈ = η² (r - z) - (0, 0, 9.81)
with z the ZMP input. Note the reference applies the η² term to ALL THREE
axes including z (prb.py:318) — we reproduce that exactly for parity.

Also reconstructs the `lip.LIP_dynamics(m, f, r, rddot, c)` constraint
residual that isrbd_example.py:24,345 imports from a module that is absent
from the repository (SURVEY.md §2.2 "missing-by-omission"): the natural
residual consistent with its call signature and use as a dynamics constraint
alongside `kin_dyn.SRBD` (isrbd_example.py:344-348) enforces that the CoM
accelerates like a LIP whose pivot is the contact centroid.
"""

from __future__ import annotations

import jax.numpy as jnp

GRAVITY = 9.81
LIP_HEIGHT = 0.88
ETA2 = GRAVITY / LIP_HEIGHT


def lip_rddot(r, z, eta2=ETA2):
    """CoM acceleration of the LIP (prb.py:317-319)."""
    g = jnp.array([0.0, 0.0, GRAVITY], dtype=r.dtype)
    return eta2 * (r - z) - g


def lip_xdot(state, inputs, constants=None, eta2=ETA2):
    """Continuous-time LIP state derivative — `double_integrator` over the
    LIP position aggregate (prb.py:323-329).

    State layout (prb.py:264-287):
        [ r(3), c_0..c_{nc-1}(3 each), rdot(3), cdot_0..cdot_{nc-1}(3) ]
        nx = 6 + 6 nc
    Input layout (prb.py:292-295):
        [ z(3), cddot_0(3), ..., cddot_{nc-1}(3) ]   nu = 3 + 3 nc
    """
    nc = (state.shape[-1] - 6) // 6
    r = state[0:3]
    rdot = state[3 + 3 * nc : 6 + 3 * nc]
    cdot = state[6 + 3 * nc : 6 + 6 * nc]

    z = inputs[0:3]
    cddot = inputs[3 : 3 + 3 * nc]

    rddot = lip_rddot(r, z, eta2)
    return jnp.concatenate([rdot, cdot, rddot, cddot])


def lip_dynamics_residual(m, forces, r, rddot, contacts, eta2=ETA2):
    """Reconstruction of the missing `lip.LIP_dynamics(m, f, r, rddot, c)`
    (isrbd_example.py:24,345): 3-vector residual, zero when the CoM
    acceleration matches a LIP pivoting about the support centroid:
        m ( r̈ - [η² (r - zmp) - g] ) = 0,
        zmp = [mean(contacts)_xy, 0].
    The pivot is the ZMP, which lives ON the support surface: its xy is
    the contact centroid, its z the ground plane. (An earlier
    reconstruction averaged the contact HEIGHTS into the pivot too; that
    made the z-row structurally inconsistent with the fixed-CoM-height
    LIP-zone constraint whenever a swing foot is airborne — the two rows
    then disagree by η²·mean(c_z) ≈ 0.28 m/s² at apex, an irreducible
    ~2e-2 scaled violation no AL schedule can remove. With the pivot on
    the ground, r_z = const ⟺ rddot_z = η² r_z − g = 0 and the hybrid
    stack is consistent through swing.)
    The `forces` argument participates only through the Newton equation
    consistency m(r̈ - g) = Σf, which the SRBD constraint on earlier nodes
    already covers; we keep the signature for API parity."""
    del forces
    zmp = jnp.concatenate([
        jnp.mean(contacts[:, :2], axis=0),
        jnp.zeros((1,), r.dtype),
    ])
    return m * (rddot - lip_rddot(r, zmp, eta2))


def split_lip_state(state, nc):
    """Named view of a LIP state vector (prb.py:264-287 ordering)."""
    return dict(
        r=state[..., 0:3],
        c=state[..., 3 : 3 + 3 * nc].reshape(*state.shape[:-1], nc, 3),
        rdot=state[..., 3 + 3 * nc : 6 + 3 * nc],
        cdot=state[..., 6 + 3 * nc : 6 + 6 * nc].reshape(
            *state.shape[:-1], nc, 3
        ),
    )


def split_lip_input(inputs, nc):
    return dict(
        z=inputs[..., 0:3],
        cddot=inputs[..., 3 : 3 + 3 * nc].reshape(*inputs.shape[:-1], nc, 3),
    )
