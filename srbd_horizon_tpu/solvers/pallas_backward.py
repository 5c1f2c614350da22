"""Pallas TPU kernel: fused backward Riccati sweep with double-buffered
HBM streaming.

Motivation: the XLA lane-major backward (msddp._backward_lanemajor) issues
~10 separate fused ops per scan step, each bouncing (nx,nx,B) intermediates
through HBM. Here the whole sweep for one batch tile runs in a single
program: the value function (Vxx, Vx) lives in VMEM scratch across all ns
nodes, each node's LQ data arrives as ONE packed DMA (double-buffered so
the copy for node n-1 overlaps the compute of node n), and the only HBM
traffic is one read of the inputs plus one write of the gains.

Layout: batch-on-lanes. Every tensor is (..., BT) with BT scenarios on the
128-lane axis; all matrix algebra is elementwise VPU work at full lane
occupancy, contractions unrolled over the static (tiny) matrix dims. The
SPD gain solve is the block-Schur recursion of math/linalg specialized to
this layout. VMEM budget at BT=128 for the SRBD problem (nx=37, nu=24):
2×2.7 MB input slabs + 2×0.5 MB gain out-slabs + 0.7 MB value carry +
temporaries ≈ 10 MB.

Packing (host side, `pack_node_data`): per node concatenate the flattened
(A, B, lx, lu, lxx, luu, lux, d) feature blocks → (ns, F, B). The kernel
unpacks with static offsets.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------- lane-major mini-algebra (unrolled contractions) --------

def _mm_tn(A, Bm):
    """C[i,j,b] = Σ_k A[k,i,b]·B[k,j,b] (first operand transposed)."""
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
    """y[i,b] = Σ_k A[i,k,b]·v[k,b] — unrolled (Mosaic dislikes axis
    reductions that change the sublane layout)."""
    K = A.shape[1]
    acc = A[:, 0, :] * v[0][None, :]
    for k in range(1, K):
        acc = acc + A[:, k, :] * v[k][None, :]
    return acc


def _mv_tn(A, v):
    """y[i,b] = Σ_k A[k,i,b]·v[k,b] — unrolled."""
    K = A.shape[0]
    acc = A[0] * v[0][None, :]
    for k in range(1, K):
        acc = acc + A[k] * v[k][None, :]
    return acc


def _vdot(a, b):
    """s[1,b] = Σ_i a[i,b]·b[i,b] — 2D result (1, B)."""
    prod = a * b
    return jnp.sum(prod, axis=0, keepdims=True)


def _transpose(A):
    return jnp.swapaxes(A, 0, 1)


def _row(x):
    """(B,) lane vector -> (1, B) 2D row (keeps Mosaic layouts happy)."""
    return x[None, :]


def _inv2(A):
    # all intermediates kept 2D: (1, B)
    a, b = _row(A[0, 0]), _row(A[0, 1])
    c, d = _row(A[1, 0]), _row(A[1, 1])
    det = a * d - b * c
    r0 = jnp.concatenate([d / det, -b / det], axis=0)      # (2, B)
    r1 = jnp.concatenate([-c / det, a / det], axis=0)
    return jnp.concatenate([r0[None], r1[None]], axis=0)   # (2, 2, B)


def _inv3(A):
    a = [[_row(A[i, j]) for j in range(3)] for i in range(3)]
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c02 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c10 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c20 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    c21 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    det = a[0][0] * c00 + a[0][1] * c10 + a[0][2] * c20
    rows = [
        jnp.concatenate([c00 / det, c01 / det, c02 / det], axis=0),
        jnp.concatenate([c10 / det, c11 / det, c12 / det], axis=0),
        jnp.concatenate([c20 / det, c21 / det, c22 / det], axis=0),
    ]
    return jnp.concatenate([r[None] for r in rows], axis=0)  # (3, 3, B)


def _spd_inv(A):
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


# ---------------- packing ------------------------------------------------

def _offsets(nx: int, nu: int):
    sizes = dict(
        A=nx * nx, B=nx * nu, lx=nx, lu=nu,
        lxx=nx * nx, luu=nu * nu, lux=nu * nx, d=nx,
    )
    offs = {}
    o = 0
    for k, s in sizes.items():
        offs[k] = (o, o + s)
        o += s
    return offs, o


def pack_node_data(A, Bm, lx, lu, lxx, luu, lux, d):
    """Concatenate per-node LQ blocks into one (ns, F, B) array (host/XLA
    side — one DMA per node inside the kernel). F is padded to a multiple
    of 8 so HBM memref slices stay sublane-tile aligned."""
    ns = A.shape[0]
    B = A.shape[-1]

    def flat(x):
        return x.reshape(ns, -1, B)

    packed = jnp.concatenate(
        [flat(A), flat(Bm), flat(lx), flat(lu), flat(lxx), flat(luu),
         flat(lux), flat(d)],
        axis=1,
    )
    F = packed.shape[1]
    pad = (-F) % 8
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))
    return packed


# ---------------- kernel -------------------------------------------------

def _backward_kernel(
    packed_hbm,        # (ns, F, B) in HBM/ANY
    VxxT_ref, VxT_ref,  # VMEM blocks (nx, nx, BT), (nx, BT)
    ks_ref,            # VMEM out (ns, nu, BT)
    dV1_ref, dV2_ref,  # VMEM out (BT,)
    Ks_hbm,            # (ns, nu, nx, B) in HBM/ANY (DMA'd out)
    buf, kbuf, in_sems, out_sems,
    *, ns: int, nx: int, nu: int, mu: float, block_batch: int,
):
    i = pl.program_id(0)
    b0 = i * block_batch
    offs, _F = _offsets(nx, nu)

    def dma_in(n, slot):
        return pltpu.make_async_copy(
            packed_hbm.at[n, :, pl.ds(b0, block_batch)],
            buf.at[slot],
            in_sems.at[slot],
        )

    def dma_out(n, slot):
        return pltpu.make_async_copy(
            kbuf.at[slot],
            Ks_hbm.at[n, :, :, pl.ds(b0, block_batch)],
            out_sems.at[slot],
        )

    def unpack(data, name, shape):
        lo, hi = offs[name]
        return data[lo:hi].reshape(shape + (block_batch,))

    dma_in(ns - 1, (ns - 1) % 2).start()

    bt = block_batch
    mu_eye = mu * jnp.eye(nu, dtype=VxT_ref.dtype)[:, :, None]

    # node loop as fori_loop (one traced body instead of ns unrolled
    # copies — the fully unrolled form produced ~30k vector ops and
    # pathological Mosaic compile times)
    def body(t, carry):
        Vx, Vxx, dV1, dV2 = carry
        n = ns - 1 - t
        slot = jax.lax.rem(n, 2)

        @pl.when(n > 0)
        def _():
            dma_in(n - 1, 1 - slot).start()

        dma_in(n, slot).wait()
        data = buf[slot]
        A = unpack(data, "A", (nx, nx))
        Bm = unpack(data, "B", (nx, nu))
        lx = unpack(data, "lx", (nx,))
        lu = unpack(data, "lu", (nu,))
        lxx = unpack(data, "lxx", (nx, nx))
        luu = unpack(data, "luu", (nu, nu))
        lux = unpack(data, "lux", (nu, nx))
        d = unpack(data, "d", (nx,))

        Vx_d = Vx + _mv(Vxx, d)
        Qx = lx + _mv_tn(A, Vx_d)
        Qu = lu + _mv_tn(Bm, Vx_d)
        VA = _mm(Vxx, A)
        VB = _mm(Vxx, Bm)
        Qxx = lxx + _mm_tn(A, VA)
        Quu = luu + _mm_tn(Bm, VB) + mu_eye
        Qux = lux + _mm_tn(Bm, VA)
        iQ = _spd_inv(Quu)
        k = -_mv(iQ, Qu)
        K = -_mm(iQ, Qux)
        Quu_k = _mv(Quu, k)
        KQuu = _mm_tn(K, Quu)
        Vx_new = Qx + _mv(KQuu, k) + _mv_tn(K, Qu) + _mv_tn(Qux, k)
        KtQux = _mm_tn(K, Qux)
        Vxx_new = Qxx + _mm(KQuu, K) + KtQux + _transpose(KtQux)
        Vxx_new = 0.5 * (Vxx_new + _transpose(Vxx_new))
        dV1 = dV1 + _vdot(k, Qu)
        dV2 = dV2 + 0.5 * _vdot(k, Quu_k)

        ks_ref[n] = k
        # the same slot's previous transfer (node n+2) must have drained
        # before its buffer is overwritten
        @pl.when(n <= ns - 3)
        def _():
            dma_out(n + 2, slot).wait()

        # kbuf's nx axis is padded to a sublane multiple so the out-DMA
        # slices stay tile-aligned; pad rows carry garbage (sliced off by
        # the caller)
        kbuf[slot, :, :nx, :] = K
        dma_out(n, slot).start()
        return (Vx_new, Vxx_new, dV1, dV2)

    init = (
        VxT_ref[:],
        VxxT_ref[:],
        jnp.zeros((1, bt), VxT_ref.dtype),
        jnp.zeros((1, bt), VxT_ref.dtype),
    )
    _, _, dV1, dV2 = jax.lax.fori_loop(0, ns, body, init)

    # drain the last two gain transfers
    dma_out(0, 0).wait()
    if ns >= 2:
        dma_out(1, 1).wait()

    dV1_ref[:] = dV1
    dV2_ref[:] = dV2


def backward_sweep_pallas(
    packed, VxxT, VxT,
    *, nx: int, nu: int, mu: float,
    block_batch: int = 128,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """packed: (ns, F, B) from `pack_node_data`; VxxT (nx, nx, B),
    VxT (nx, B). Returns lane-major (ks (ns,nu,B), Ks (ns,nu,nx,B),
    dV1 (B,), dV2 (B,))."""
    ns, F, B = packed.shape
    assert B % block_batch == 0, (B, block_batch)
    grid = (B // block_batch,)
    dtype = packed.dtype
    nxp = ((nx + 7) // 8) * 8  # sublane-aligned nx for the Ks stream

    def batch_spec(prefix):
        return pl.BlockSpec(
            prefix + (block_batch,),
            lambda i, _p=len(prefix): (0,) * _p + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _backward_kernel, ns=ns, nx=nx, nu=nu, mu=mu,
        block_batch=block_batch,
    )
    ks, dV1, dV2, Ks = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # packed stays in HBM
            batch_spec((nx, nx)),
            batch_spec((nx,)),
        ],
        out_specs=[
            batch_spec((ns, nu)),
            batch_spec((1,)),
            batch_spec((1,)),
            pl.BlockSpec(memory_space=pl.ANY),     # Ks streamed via DMA
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, nu, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((ns, nu, nxp, B), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, F, block_batch), dtype),
            pltpu.VMEM((2, nu, nxp, block_batch), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(packed, VxxT, VxT)
    return ks, Ks[:, :, :nx, :], dV1[0], dV2[0]
