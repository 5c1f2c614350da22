"""Quaternion utilities in the reference's (x, y, z, w) convention.

The reference relies on Horizon's `utils.toRot` / `utils.quaterion_product`
(prb.py:97,187) and its own `utilities.quat_inverse` (utilities.py:34-37) and
treats the base orientation as 4 unconstrained states, renormalizing only in
simulation (dsrbd_example.py:160) — we reproduce that contract exactly
(SURVEY.md §7.4 item 3).

All functions are pure, jittable, and batch along leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of a 3-vector."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def quat_product(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product p ⊗ q with (x, y, z, w) layout.

    Matches Horizon `utils.quaterion_product` as used for the orientation
    tracking error `o ⊗ oref⁻¹` (reference prb.py:187-189).
    """
    pv, pw = p[..., :3], p[..., 3:4]
    qv, qw = q[..., :3], q[..., 3:4]
    vec = pw * qv + qw * pv + jnp.cross(pv, qv)
    w = pw * qw - jnp.sum(pv * qv, axis=-1, keepdims=True)
    return jnp.concatenate([vec, w], axis=-1)


def quat_inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions): negate the vector part.

    Functional version of reference utilities.py:34-37 (which mutates its
    argument in place — a reference quirk we do not reproduce).
    """
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from an (x, y, z, w) quaternion (Horizon `utils.toRot`,
    reference prb.py:97). Not normalized internally — the reference feeds
    unnormalized quaternions through toRot inside the dynamics, and
    normalization changes the Jacobians, so we keep the same semantics for
    parity. The formula below equals R for unit quaternions and a scaled
    rotation otherwise (homogeneous form)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    ww = w * w
    # Homogeneous (non-normalized) rotation matrix: for ||q||=1 this is the
    # standard direction cosine matrix.
    r00 = ww + xx - yy - zz
    r11 = ww - xx + yy - zz
    r22 = ww - xx - yy + zz
    return jnp.stack(
        [
            jnp.stack([r00, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), r11, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), r22], axis=-1),
        ],
        axis=-2,
    )


def quat_derivative_world(o: jnp.ndarray, w_world: jnp.ndarray) -> jnp.ndarray:
    """ȯ = ½ ω ⊗ o for angular velocity expressed in the world(-aligned) frame.

    This is the LOCAL_WORLD_ALIGNED convention the reference selects in
    `double_integrator_with_floating_base` (prb.py:107-108,
    isrbd_example.py:131)."""
    w_quat = jnp.concatenate([w_world, jnp.zeros_like(w_world[..., :1])], axis=-1)
    return 0.5 * quat_product(w_quat, o)


def solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A⁻¹ b for a 3×3 system via the adjugate (Cramer) formula.

    TPU-first: LU decomposition is unsupported/slow for tiny systems on TPU;
    the closed form is ~40 VPU flops, fully fused, batchable, and
    differentiable. Used for the inertia solve in the SRBD dynamics."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) / det
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) / det
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize; used only at the simulation boundary, mirroring
    dsrbd_example.py:160 (`state[3:7] /= norm`)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)
