"""Pallas TPU kernel: fused backward Riccati sweep (EXPERIMENTAL —
correct but currently slower than the XLA lane-major path; see status
below).

Motivation: the XLA lane-major backward (msddp._backward_lanemajor) issues
~10 separate fused ops per scan step, each bouncing (nx,nx,B) intermediates
through HBM. Here the whole sweep for one batch tile runs in a single
program: the value function (Vxx, Vx) lives in VMEM scratch across all ns
nodes, each node's LQ data arrives as one auto-pipelined block per grid
step, and the only HBM traffic is one read of the inputs plus one write of
the gains.

STATUS (measured on TPU v5e, B=1024, SRBD nx=37/nu=24/ns=20, f32):
  - compiles and runs (riccati_mode="pallas"), matches the lane-major
    backward to f32 roundoff (rel ~1e-3 through the 1e6-penalty algebra);
  - 55.6 ms vs 27.6 ms for the XLA lane-major backward: Mosaic assigns
    ~46 MB of stack to the unrolled broadcast-FMA chains (register
    pressure → VMEM spills → memory-bound), while XLA's reduce fusions
    keep the same contractions in registers. Lesson recorded in
    BENCH_NOTES.md; default riccati_mode stays "sequential".
  - Paths not taken: batch tiles < 128 lanes are rejected by the Mosaic
    lowering (last block dim must be 128 or full), and fully unrolling the
    node loop produced pathological compile times. A fori-contraction
    variant with ref-resident operands is the next step if this kernel is
    to win.

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
    packed_ref,        # (1, F, BT) — this node's LQ data (auto-pipelined)
    VxxT_ref, VxT_ref,  # (nx, nx, BT), (nx, BT) — terminal value
    ks_ref,            # (1, nu, BT) out
    Ks_ref,            # (1, nu, nx, BT) out
    dV1_ref, dV2_ref,  # (1, BT) out (revisited block; final write wins)
    Vxx_s, Vx_s,       # persistent VMEM scratch — the value carry
    *, ns: int, nx: int, nu: int, mu: float,
):
    """One grid step = one (batch tile, node) pair. The grid's inner
    dimension walks nodes in reverse; Pallas pipelines the packed node
    slabs HBM→VMEM automatically (double-buffered), and the value function
    persists in scratch across the sequential grid steps."""
    n_rev = pl.program_id(1)           # 0 .. ns-1, node = ns-1-n_rev
    offs, _F = _offsets(nx, nu)

    @pl.when(n_rev == 0)
    def _():
        Vxx_s[:] = VxxT_ref[:]
        Vx_s[:] = VxT_ref[:]
        dV1_ref[:] = jnp.zeros_like(dV1_ref)
        dV2_ref[:] = jnp.zeros_like(dV2_ref)

    def unpack(name, shape):
        lo, hi = offs[name]
        return packed_ref[0, lo:hi].reshape(shape + (packed_ref.shape[-1],))

    A = unpack("A", (nx, nx))
    Bm = unpack("B", (nx, nu))
    lx = unpack("lx", (nx,))
    lu = unpack("lu", (nu,))
    lxx = unpack("lxx", (nx, nx))
    luu = unpack("luu", (nu, nu))
    lux = unpack("lux", (nu, nx))
    d = unpack("d", (nx,))

    mu_eye = mu * jnp.eye(nu, dtype=lx.dtype)[:, :, None]
    Vxx = Vxx_s[:]
    Vx = Vx_s[:]

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

    Vxx_s[:] = Vxx_new
    Vx_s[:] = Vx_new
    ks_ref[0] = k
    Ks_ref[0] = K
    dV1_ref[:] = dV1_ref[:] + _vdot(k, Qu)
    dV2_ref[:] = dV2_ref[:] + 0.5 * _vdot(k, Quu_k)


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
    # grid: batch tiles outer, nodes inner (sequential on TPU — scratch
    # carries the value function between steps; blocks auto-pipelined)
    grid = (B // block_batch, ns)
    dtype = packed.dtype
    bt = block_batch

    kernel = functools.partial(
        _backward_kernel, ns=ns, nx=nx, nu=nu, mu=mu
    )
    ks, Ks, dV1, dV2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, F, bt), lambda i, n: (ns - 1 - n, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nx, nx, bt), lambda i, n: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nx, bt), lambda i, n: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, nu, bt), lambda i, n: (ns - 1 - n, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nu, nx, bt), lambda i, n: (ns - 1 - n, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, bt), lambda i, n: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, n: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ns, nu, B), dtype),
            jax.ShapeDtypeStruct((ns, nu, nx, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, bt), dtype),
            pltpu.VMEM((nx, bt), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # Mosaic's default scoped-vmem budget (16M) undercounts what
            # this body needs transiently; raise it toward the physical
            # VMEM so the unrolled contractions' live ranges fit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed, VxxT, VxT)
    return ks, Ks, dV1[0], dV2[0]
