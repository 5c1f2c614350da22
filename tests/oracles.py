"""Independent NumPy float64 oracles for parity testing (SURVEY.md §4).

These are written directly from the physics / reference equations, NOT from
the framework code, so they catch transcription errors in the JAX
implementations. Everything here is plain NumPy, no JAX.
"""

import numpy as np

G = 9.81


# ---------- quaternions (x, y, z, w) ----------

def quat_product_np(p, q):
    x1, y1, z1, w1 = p
    x2, y2, z2, w2 = q
    return np.array(
        [
            w1 * x2 + w2 * x1 + (y1 * z2 - z1 * y2),
            w1 * y2 + w2 * y1 + (z1 * x2 - x1 * z2),
            w1 * z2 + w2 * z1 + (x1 * y2 - y1 * x2),
            w1 * w2 - (x1 * x2 + y1 * y2 + z1 * z2),
        ]
    )


def quat_to_rot_np(q):
    x, y, z, w = q
    return np.array(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        ]
    )


# ---------- SRBD Newton–Euler ----------

def srbd_accels_np(m, I_world, forces, r, contacts, w):
    """rddot, wdot from forces — the fSRBD direction (prb.py:99)."""
    g = np.array([0.0, 0.0, -G])
    rddot = forces.sum(axis=0) / m + g
    torque = np.cross(contacts - r, forces).sum(axis=0)
    wdot = np.linalg.solve(I_world, torque - np.cross(w, I_world @ w))
    return rddot, wdot


def srbd_residual_np(m, I_world, forces, r, rddot, contacts, w, wdot):
    """Newton–Euler residual — the kin_dyn.SRBD direction
    (isrbd_example.py:332-334)."""
    g = np.array([0.0, 0.0, -G])
    lin = m * (rddot - g) - forces.sum(axis=0)
    ang = I_world @ wdot + np.cross(w, I_world @ w) - np.cross(
        contacts - r, forces
    ).sum(axis=0)
    return np.concatenate([lin, ang])


# ---------- LIP ----------

def lip_rddot_np(r, z, eta2=G / 0.88):
    return eta2 * (r - z) - np.array([0.0, 0.0, G])
