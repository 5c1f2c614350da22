"""Pallas TPU kernel: fused backward Riccati sweep.

The XLA lane-major backward (msddp._backward_lanemajor) still issues ~10
separate fused ops per scan step, each round-tripping (nx,nx,B) intermediates
through HBM. This kernel runs the whole sweep for a batch tile in one
program: the value function (Vxx, Vx) lives in VMEM scratch across all ns
nodes, per-node inputs are streamed HBM→VMEM with double buffering, and the
feedback gains are streamed back out — one HBM read of the inputs, one HBM
write of the outputs, zero intermediate traffic.

Layout: batch-on-lanes. Every tensor is (..., BT) with BT=128 scenarios on
the 128-lane axis, so all matrix algebra is elementwise VPU work at full
lane occupancy; contractions unroll over the (tiny, static) matrix
dimensions. The 24×24 SPD gain solve uses the same block-Schur recursion as
math/linalg, specialized to this layout.

Inputs are the per-node LQ data produced by the GN quadratization
(A, B, lx, lu, lxx, luu, lux, d) plus the terminal (VxxT, VxT); outputs are
(ks, Ks, dV1, dV2) exactly as msddp._backward_lanemajor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_tn(A, Bm):
    """C[i,j,b] = Σ_k A[k,i,b]·B[k,j,b], unrolled over k (static)."""
    K = A.shape[0]
    acc = A[0][:, None, :] * Bm[0][None, :, :]
    for k in range(1, K):
        acc = acc + A[k][:, None, :] * Bm[k][None, :, :]
    return acc


def _mm(A, Bm):
    """C[i,j,b] = Σ_k A[i,k,b]·B[k,j,b]."""
    K = A.shape[1]
    acc = A[:, 0, :][:, None, :] * Bm[0][None, :, :]
    for k in range(1, K):
        acc = acc + A[:, k, :][:, None, :] * Bm[k][None, :, :]
    return acc


def _mv(A, v):
    """y[i,b] = Σ_k A[i,k,b]·v[k,b]."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _mv_tn(A, v):
    """y[i,b] = Σ_k A[k,i,b]·v[k,b]."""
    return jnp.sum(A * v[:, None, :], axis=0)


def _transpose(A):
    return jnp.swapaxes(A, 0, 1)


def _inv2(A):
    a, b, c, d = A[0, 0], A[0, 1], A[1, 0], A[1, 1]
    det = a * d - b * c
    r0 = jnp.stack([d, -b], axis=0)
    r1 = jnp.stack([-c, a], axis=0)
    return jnp.stack([r0, r1], axis=0) / det[None, None, :]


def _inv3(A):
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c02 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c10 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c20 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    c21 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    det = A[0, 0] * c00 + A[0, 1] * c10 + A[0, 2] * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=0),
            jnp.stack([c10, c11, c12], axis=0),
            jnp.stack([c20, c21, c22], axis=0),
        ],
        axis=0,
    )
    return adj / det[None, None, :]


def _spd_inv(A):
    """Block-Schur SPD inverse, lane-major, fully unrolled recursion."""
    n = A.shape[0]
    if n == 1:
        return 1.0 / A
    if n == 2:
        return _inv2(A)
    if n == 3:
        return _inv3(A)
    k = n // 2
    A11, A12 = A[:k, :k], A[:k, k:]
    A21, A22 = A[k:, :k], A[k:, k:]
    iA11 = _spd_inv(A11)
    iA11_A12 = _mm(iA11, A12)
    S = A22 - _mm(A21, iA11_A12)
    iS = _spd_inv(S)
    B12 = -_mm(iA11_A12, iS)
    B11 = iA11 - _mm(B12, _mm(A21, iA11))
    B21 = _transpose(B12)
    top = jnp.concatenate([B11, B12], axis=1)
    bot = jnp.concatenate([B21, iS], axis=1)
    out = jnp.concatenate([top, bot], axis=0)
    return 0.5 * (out + _transpose(out))


def _backward_kernel(
    # inputs (VMEM blocks, one batch tile; node axis leading)
    A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref, d_ref,
    VxxT_ref, VxT_ref,
    # outputs
    ks_ref, Ks_ref, dV1_ref, dV2_ref,
    *, ns: int, nx: int, nu: int, mu: float,
):
    Vxx = VxxT_ref[:]
    Vx = VxT_ref[:]
    bt = Vx.shape[-1]
    dV1 = jnp.zeros((bt,), Vx.dtype)
    dV2 = jnp.zeros((bt,), Vx.dtype)
    mu_eye = mu * jnp.eye(nu, dtype=Vx.dtype)[:, :, None]

    for n in range(ns - 1, -1, -1):
        A = A_ref[n]
        Bm = B_ref[n]
        d = d_ref[n]
        Vx_d = Vx + _mv(Vxx, d)
        Qx = lx_ref[n] + _mv_tn(A, Vx_d)
        Qu = lu_ref[n] + _mv_tn(Bm, Vx_d)
        VA = _mm(Vxx, A)
        VB = _mm(Vxx, Bm)
        Qxx = lxx_ref[n] + _mm_tn(A, VA)
        Quu = luu_ref[n] + _mm_tn(Bm, VB) + mu_eye
        Qux = lux_ref[n] + _mm_tn(Bm, VA)
        iQ = _spd_inv(Quu)
        k = -_mv(iQ, Qu)
        K = -_mm(iQ, Qux)
        Quu_k = _mv(Quu, k)
        KQuu = _mm_tn(K, Quu)
        Vx = Qx + _mv(KQuu, k) + _mv_tn(K, Qu) + _mv_tn(Qux, k)
        KtQux = _mm_tn(K, Qux)
        Vxx_new = Qxx + _mm(KQuu, K) + KtQux + _transpose(KtQux)
        Vxx = 0.5 * (Vxx_new + _transpose(Vxx_new))
        dV1 = dV1 + jnp.sum(k * Qu, axis=0)
        dV2 = dV2 + 0.5 * jnp.sum(k * Quu_k, axis=0)
        ks_ref[n] = k
        Ks_ref[n] = K

    dV1_ref[:] = dV1
    dV2_ref[:] = dV2


def backward_sweep_pallas(
    A, Bm, lx, lu, lxx, luu, lux, d, VxxT, VxT,
    mu: float,
    block_batch: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused sweep. All array args lane-major with trailing batch:
    A (ns, nx, nx, B), ..., VxxT (nx, nx, B), VxT (nx, B). B must be a
    multiple of block_batch. Returns (ks (ns,nu,B), Ks (ns,nu,nx,B),
    dV1 (B,), dV2 (B,))."""
    ns, nx, _, B = A.shape
    nu = Bm.shape[2]
    assert B % block_batch == 0, (B, block_batch)
    grid = (B // block_batch,)
    dtype = A.dtype

    def bspec(rank_prefix):
        # block over the trailing batch axis only
        def index_map(i):
            return tuple([0] * rank_prefix) + (i,)
        return index_map

    def spec(shape_prefix):
        return pl.BlockSpec(
            shape_prefix + (block_batch,),
            bspec(len(shape_prefix)),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _backward_kernel, ns=ns, nx=nx, nu=nu, mu=mu
    )
    ks, Ks, dV1, dV2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((ns, nx, nx)), spec((ns, nx, nu)),
            spec((ns, nx)), spec((ns, nu)),
            spec((ns, nx, nx)), spec((ns, nu, nu)), spec((ns, nu, nx)),
            spec((ns, nx)),
            spec((nx, nx)), spec((nx,)),
        ],
        out_specs=[
            spec((ns, nu)), spec((ns, nu, nx)), spec(()), spec(()),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, nu, B), dtype),
            jax.ShapeDtypeStruct((ns, nu, nx, B), dtype),
            jax.ShapeDtypeStruct((B,), dtype),
            jax.ShapeDtypeStruct((B,), dtype),
        ],
        interpret=interpret,
    )(A, Bm, lx, lu, lxx, luu, lux, d, VxxT, VxT)
    return ks, Ks, dV1, dV2
