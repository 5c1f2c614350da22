"""Small-matrix batched linear algebra tuned for TPU.

XLA's `cholesky` lowers to a sequential column loop (O(n) dependent steps
of tiny vector ops) — measured at ~70% of the whole Riccati backward sweep
for batched 24×24 solves. `spd_inverse` replaces it with a recursive
2×2-block Schur inversion: ⌈log₂(n/3)⌉ levels of *batched matmuls* (MXU
work, no sequential columns), with closed forms at n ≤ 3.

Numerically: for an SPD matrix with condition κ both approaches lose
O(κ·ε) — the μ-regularized Gauss-Newton Quu this is used on is exactly the
case. Equivalence vs Cholesky is covered by solver tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def _inv1(A):
    return 1.0 / A


def _inv2(A):
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 1, 0]
    d = A[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def _inv3(A):
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
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def spd_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (batched) symmetric positive-definite matrix via
    recursive block-Schur elimination. Batch dims lead; the matrix is the
    trailing (n, n)."""
    n = A.shape[-1]
    if n == 1:
        return _inv1(A)
    if n == 2:
        return _inv2(A)
    if n == 3:
        return _inv3(A)
    k = n // 2
    A11 = A[..., :k, :k]
    A12 = A[..., :k, k:]
    A21 = A[..., k:, :k]
    A22 = A[..., k:, k:]
    iA11 = spd_inverse(A11)
    iA11_A12 = iA11 @ A12
    S = A22 - A21 @ iA11_A12
    iS = spd_inverse(S)
    B12 = -iA11_A12 @ iS
    B11 = iA11 - B12 @ (A21 @ iA11)
    B21 = jnp.swapaxes(B12, -1, -2)
    top = jnp.concatenate([B11, B12], axis=-1)
    bot = jnp.concatenate([B21, iS], axis=-1)
    out = jnp.concatenate([top, bot], axis=-2)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x = A⁻¹ b for SPD A (batched), via spd_inverse — one extra matmul
    instead of two sequential triangular solves."""
    return spd_inverse(A) @ b


# ---------------------------------------------------------------------------
# Lane-major batched algebra: matrices stored (n, m, B) with the batch LAST.
#
# Why: a batch-first batched matmul (B, n, n) @ (B, n, n) is lowered by XLA
# as B independent tiny MXU matmuls — each 37×37 operand padded into a
# 128×128 systolic tile (~2% utilization, measured ~830 GFLOP/s). With the
# batch on the minor (lane) dimension the contraction becomes a fused
# broadcast-multiply-reduce on the VPU: full 128-lane occupancy regardless
# of the matrix size.
# ---------------------------------------------------------------------------


def lm_matmul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """C[i,j,b] = Σ_k A[i,k,b]·B[k,j,b] for lane-major (n, k, B)·(k, m, B)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def lm_matmul_tn(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """C[i,j,b] = Σ_k A[k,i,b]·B[k,j,b] — first operand transposed."""
    return jnp.sum(A[:, :, None, :] * B[:, None, :, :], axis=0)


def lm_matvec(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """y[i,b] = Σ_k A[i,k,b]·v[k,b]."""
    return jnp.sum(A * v[None, :, :], axis=1)


def lm_matvec_tn(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """y[i,b] = Σ_k A[k,i,b]·v[k,b]."""
    return jnp.sum(A * v[:, None, :], axis=0)


def lm_transpose(A: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(A, 0, 1)


def _lm_inv2(A):
    a, b = A[0, 0], A[0, 1]
    c, d = A[1, 0], A[1, 1]
    det = a * d - b * c
    row0 = jnp.stack([d, -b], axis=0)
    row1 = jnp.stack([-c, a], axis=0)
    return jnp.stack([row0, row1], axis=0) / det[None, None, :]


def _lm_inv3(A):
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a10, a11, a12 = A[1, 0], A[1, 1], A[1, 2]
    a20, a21, a22 = A[2, 0], A[2, 1], A[2, 2]
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
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=0),
            jnp.stack([c10, c11, c12], axis=0),
            jnp.stack([c20, c21, c22], axis=0),
        ],
        axis=0,
    )
    return adj / det[None, None, :]


def lm_spd_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Recursive block-Schur SPD inverse in lane-major layout (n, n, B)."""
    n = A.shape[0]
    if n == 1:
        return 1.0 / A
    if n == 2:
        return _lm_inv2(A)
    if n == 3:
        return _lm_inv3(A)
    k = n // 2
    A11, A12 = A[:k, :k], A[:k, k:]
    A21, A22 = A[k:, :k], A[k:, k:]
    iA11 = lm_spd_inverse(A11)
    iA11_A12 = lm_matmul(iA11, A12)
    S = A22 - lm_matmul(A21, iA11_A12)
    iS = lm_spd_inverse(S)
    B12 = -lm_matmul(iA11_A12, iS)
    B11 = iA11 - lm_matmul(B12, lm_matmul(A21, iA11))
    B21 = lm_transpose(B12)
    top = jnp.concatenate([B11, B12], axis=1)
    bot = jnp.concatenate([B21, iS], axis=1)
    out = jnp.concatenate([top, bot], axis=0)
    return 0.5 * (out + lm_transpose(out))
