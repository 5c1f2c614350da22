"""Multiple-shooting Gauss-Newton DDP — the TPU-native replacement for the
reference's closed-source C++ `pyddp.DdpSolver` + its Horizon adapter
(reference ddp.py:10-230; option surface ddp.py:14-35; solve contract
ddp.py:96-106: `solve(params) -> (x: nx×(ns+1), u: nu×ns)`, `is_converged`,
`set_initial_state`, `set_x_warmstart`, `set_u_warmstart`).

Capability map:
  - Per-node scalar cost L_n = Σ‖residual‖² + w_c Σ‖eq‖² (ddp.py:179-214,
    constraint_weight=1e6 at ddp.py:181) — here kept in *residual* form so
    the quadratization is exact Gauss-Newton (JᵀJ), not a generic Hessian:
    better conditioned and cheaper than the reference's symbolic second
    derivatives.
  - Terminal cost L_N = Σ‖residual‖² with NO constraint penalty
    (ddp.py:216-226) — reproduced exactly.
  - Discrete dynamics = one explicit Euler step per node (ddp.py:228-230).
  - Multiple shooting: the solver iterates on a state *trajectory* with
    defects d_n = f(x_n,u_n) − x_{n+1}; the forward pass contracts defects
    by (1−α) per accepted step (the standard MS-DDP scheme; the reference
    README's open TODOs "prove MS DDP equations", "defect contraction rate"
    README.md:5-6 identify pyddp as the same family).

TPU-first design (SURVEY.md §7.1, §7.2 layer 5):
  - Derivatives: `jax.jacfwd` of residual/dynamics stacks, `vmap`ed over
    nodes — one fused batched evaluation instead of the reference's O(ns)
    Python loop of CasADi graph builds (ddp.py:83-91).
  - Backward Riccati sweep: `lax.scan` (reverse) over nodes.
  - Armijo backtracking line search: bounded `lax.while_loop` with masked
    updates, so batched problem instances can converge at different
    iterations (SURVEY.md §7.4 item 4).
  - The whole solve is one jittable pure function of
    (x0, params, warm-start) — `vmap` gives the batched scenario axis,
    `shard_map` distributes it over a mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srbd_horizon_tpu.config import DDPOptions
from srbd_horizon_tpu.math.linalg import (
    lm_matmul,
    lm_matmul_tn,
    lm_matvec,
    lm_matvec_tn,
    lm_spd_inverse,
    lm_transpose,
    spd_solve,
)
from srbd_horizon_tpu.ocp.spec import OCP


def _contiguous_runs(rows):
    """Sorted row indices -> list of (start, stop) contiguous runs.
    The declared sparsity sets (residual/dynamics rows) are unions of a
    few contiguous ranges, so row selection compiles to static slices —
    measured faster than `jnp.take` gathers on TPU."""
    rows = sorted(int(r) for r in rows)
    runs = []
    start = prev = rows[0]
    for r in rows[1:]:
        if r == prev + 1:
            prev = r
            continue
        runs.append((start, prev + 1))
        start = prev = r
    runs.append((start, prev + 1))
    return runs


def _slice_rows(arr, runs, axis):
    """Concatenate static contiguous slices of `arr` along `axis`."""
    if len(runs) == 1:
        a, b = runs[0]
        return jax.lax.slice_in_dim(arr, a, b, axis=axis)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(arr, a, b, axis=axis) for a, b in runs],
        axis=axis,
    )


def _complement_runs(runs, total):
    """The contiguous runs covering [0, total) that `runs` does not."""
    out, pos = [], 0
    for a, b in runs:
        if a > pos:
            out.append((pos, a))
        pos = b
    if pos < total:
        out.append((pos, total))
    return out


def _scatter_rows(arr, runs, total, axis):
    """Inverse of `_slice_rows`: place the run-stacked blocks of `arr`
    back at their positions along `axis` (zeros elsewhere). Static
    zero-block concatenation — no gathers/scatters."""
    pieces, pos, off = [], 0, 0
    shape = list(arr.shape)
    for a, b in runs:
        if a > pos:
            shape[axis] = a - pos
            pieces.append(jnp.zeros(shape, arr.dtype))
        pieces.append(jax.lax.slice_in_dim(arr, off, off + (b - a), axis=axis))
        off += b - a
        pos = b
    if pos < total:
        shape[axis] = total - pos
        pieces.append(jnp.zeros(shape, arr.dtype))
    if len(pieces) == 1:
        return pieces[0]
    return jnp.concatenate(pieces, axis=axis)


class DDPSolution(NamedTuple):
    """Solver state/result — a pytree. X/U persist across `solve` calls so
    each MPC tick warm-starts from the previous plan, matching the stateful
    C++ solver's behavior across ticks (ddp.py:96-106)."""

    X: jnp.ndarray          # (ns+1, nx) state trajectory
    U: jnp.ndarray          # (ns, nu) input trajectory
    cost: jnp.ndarray       # final total cost (scalar)
    converged: jnp.ndarray  # bool — is_converged() (ddp.py:106)
    iterations: jnp.ndarray  # int32 — DDP iterations taken
    defect_norm: jnp.ndarray  # max-norm of multiple-shooting defects


class _IterState(NamedTuple):
    X: jnp.ndarray
    U: jnp.ndarray
    cost: jnp.ndarray
    converged: jnp.ndarray
    it: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MSDDP:
    """Multiple-shooting GN-DDP over a fixed OCP. Construct once per problem;
    `solve` is pure/jittable (compile-once, mutate-params — SURVEY.md §3.5)."""

    ocp: OCP
    opts: DDPOptions = DDPOptions()

    # ---------- cost evaluation ----------

    def _stage_rho(self, x, u, p):
        """Stacked stage residual: cost residuals + √w_c · equality
        constraints (the ddp.py:179-214 penalty, in residual form)."""
        r = self.ocp.stage_residual(x, u, p)
        h = self.ocp.stage_eq(x, u, p)
        wc = jnp.sqrt(jnp.asarray(self.opts.constraint_weight, x.dtype))
        return jnp.concatenate([r, wc * h])

    def total_cost(self, X, U, params):
        """Σ_n ‖ρ_n‖² + ‖ρ_N‖² — the objective the line search monitors."""
        ns = self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}
        rho = jax.vmap(self._stage_rho)(X[:ns], U, p_stage)
        p_term = {k: v[ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        return jnp.sum(rho * rho) + jnp.sum(rt * rt)

    # ---------- linearization (vmapped over nodes) ----------

    def _linearize(self, X, U, params, sliced=False):
        if (
            self.opts.linearize_precision == "bf16"
            and X.dtype == jnp.float32
        ):
            # bf16 Jacobian FORMATION, f32 Riccati: cast the linearization
            # point down, run the jacfwd stacks under default (bf16-input)
            # matmul precision, cast the results back. The defects `d` are
            # recomputed exactly in f32 afterwards — the forward pass
            # contracts them analytically, so they must match the rollout's
            # arithmetic, not the Jacobians'.
            Xl = X.astype(jnp.bfloat16).astype(X.dtype)
            Ul = U.astype(jnp.bfloat16).astype(U.dtype)
            pl = {
                k: v.astype(jnp.bfloat16).astype(v.dtype)
                for k, v in params.items()
            }
            with jax.default_matmul_precision("default"):
                lin = self._linearize_impl(Xl, Ul, pl, sliced=sliced)
            lin = {
                k: v.astype(jnp.bfloat16).astype(X.dtype)
                for k, v in lin.items()
            }
            lin["d"] = self._true_defects(X, U, params)
            lin["rho"] = jax.vmap(self._stage_rho)(
                X[: self.ocp.ns], U,
                {k: v[: self.ocp.ns] for k, v in params.items()},
            )
            return lin
        return self._linearize_impl(X, U, params, sliced=sliced)

    def _linearize_impl(self, X, U, params, sliced=False):
        ns, nx, nu = self.ocp.ns, self.ocp.nx, self.ocp.nu
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}

        if sliced:
            return self._linearize_sliced(X, U, params)

        def dyn_xu(xu, p):
            return self.ocp.step(xu[:nx], xu[nx:], p, dt)

        def rho_xu(xu, p):
            return self._stage_rho(xu[:nx], xu[nx:], p)

        XU = jnp.concatenate([X[:ns], U], axis=1)
        F = jax.vmap(dyn_xu)(XU, p_stage)                       # (ns, nx)
        rho = jax.vmap(rho_xu)(XU, p_stage)                     # (ns, nr)
        if self.ocp.stage_jacobians is not None and self.opts.analytic_jacobians:
            # closed-form stage linearization (e.g. problems/srbd.py) —
            # replaces nx+nu jacfwd tangent passes per node
            A, B, Jrx, Jru, Jhx, Jhu = jax.vmap(
                lambda x, u, p: self.ocp.stage_jacobians(x, u, p, dt)
            )(X[:ns], U, p_stage)
            wc = jnp.sqrt(
                jnp.asarray(self.opts.constraint_weight, X.dtype)
            )
            Jx = jnp.concatenate([Jrx, wc * Jhx], axis=1)
            Ju = jnp.concatenate([Jru, wc * Jhu], axis=1)
        else:
            # dynamics: A=∂f/∂x, B=∂f/∂u; residual GN data — via jacfwd.
            # (A fused single-jacfwd over the stacked (f, rho) output was
            # measured result-identical and speed-neutral at B=1024 —
            # 8727 vs 8709 solve/s, tools/bench_opts.py — XLA already
            # shares the tangent passes' primal coefficients across the
            # two stacks within one jit; kept split for readability.)
            Jf = jax.vmap(jax.jacfwd(dyn_xu))(XU, p_stage)      # (ns, nx, nx+nu)
            A, B = Jf[:, :, :nx], Jf[:, :, nx:]
            Jr = jax.vmap(jax.jacfwd(rho_xu))(XU, p_stage)      # (ns, nr, nx+nu)
            Jx, Ju = Jr[:, :, :nx], Jr[:, :, nx:]

        # terminal
        p_term = {k: v[self.ocp.ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        Jt = jax.jacfwd(self.ocp.terminal_residual)(X[ns], p_term)

        defects = F - X[1:]                                     # (ns, nx)
        return dict(A=A, B=B, Jx=Jx, Ju=Ju, rho=rho, rt=rt, Jt=Jt, d=defects)

    def _u_col_runs(self):
        """Contiguous runs of ocp.dynamics_u_cols, or None when every
        input column is live (no declaration, or a trivial one)."""
        uc = self.ocp.dynamics_u_cols
        if uc is None or len(set(int(c) for c in uc)) >= self.ocp.nu:
            return None
        return _contiguous_runs(uc)

    def _dyn_u_cols_fn(self, ru_runs, uc_runs):
        """f(x, u_live, u, p) -> live dynamics rows, where the tangent
        argument `u_live` covers only the declared-live input columns
        (dead columns ride along from `u` as constants) — jacfwd over
        argnums=1 then emits Bs with |uc| columns instead of nu."""
        nu = self.ocp.nu
        dt = self.ocp.dt
        ud_runs = _complement_runs(uc_runs, nu)

        def f_uc(x, ul, u, p):
            uf = _scatter_rows(ul, uc_runs, nu, 0) + _scatter_rows(
                _slice_rows(u, ud_runs, 0), ud_runs, nu, 0
            )
            return _slice_rows(self.ocp.step(x, uf, p, dt), ru_runs, 0)

        return f_uc

    def _linearize_sliced(self, X, U, params):
        """Linearization emitting ONLY the rows the blocksparse backward
        reads (opts.linearize_sliced): split jacfwd per argument — the
        x-dependent output rows wrt x and the u-dependent rows wrt u.
        Rows outside the declared sets are identically zero (A−I, B) or
        have zero Jacobian there (residuals) — the same contract the
        blocksparse backward already relies on, enforced by
        tests/test_analytic_jac.py. Each one-hot jacfwd tangent produces
        the same arithmetic as the dense path, so entries are bit-identical
        to slicing the dense Jacobians."""
        ns, nx = self.ocp.ns, self.ocp.nx
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        rx_runs = _contiguous_runs(self.ocp.dynamics_x_rows)
        ru_runs = _contiguous_runs(self.ocp.dynamics_u_rows)
        gx_runs = _contiguous_runs(self.ocp.residual_x_rows)
        gu_runs = _contiguous_runs(self.ocp.residual_u_rows)
        uc_runs = self._u_col_runs()

        def f_x(x, u, p):
            return _slice_rows(self.ocp.step(x, u, p, dt), rx_runs, 0)

        def rho_x(x, u, p):
            return _slice_rows(self._stage_rho(x, u, p), gx_runs, 0)

        def rho_u(x, u, p):
            return _slice_rows(self._stage_rho(x, u, p), gu_runs, 0)

        Xs = X[:ns]
        F = jax.vmap(lambda x, u, p: self.ocp.step(x, u, p, dt))(
            Xs, U, p_stage
        )
        rho = jax.vmap(self._stage_rho)(Xs, U, p_stage)
        eye_rx = _slice_rows(jnp.eye(nx, dtype=X.dtype), rx_runs, 0)

        def jac(fn, argnums, n_rows, n_cols):
            """AD-mode pick for one Jacobian stack (opts.linearize_ad):
            "mixed" uses jacrev when the stack has fewer rows than
            columns (one VJP pass per row vs one JVP pass per column);
            row/col counts are static (declared sparsity)."""
            if self.opts.linearize_ad == "mixed" and n_rows < n_cols:
                return jax.jacrev(fn, argnums=argnums)
            return jax.jacfwd(fn, argnums=argnums)

        n_rx = sum(b - a for a, b in rx_runs)
        n_gx = sum(b - a for a, b in gx_runs)
        n_gu = sum(b - a for a, b in gu_runs)
        Sx = jax.vmap(jac(f_x, 0, n_rx, nx))(Xs, U, p_stage) - eye_rx
        if uc_runs is None:
            def f_u(x, u, p):
                return _slice_rows(self.ocp.step(x, u, p, dt), ru_runs, 0)

            n_ru = sum(b - a for a, b in ru_runs)
            Bs = jax.vmap(jac(f_u, 1, n_ru, self.ocp.nu))(Xs, U, p_stage)
        else:
            # ocp.dynamics_u_cols: run the u-tangent passes only over the
            # input entries the dynamics consume — Bs is (ns, |ru|, |uc|);
            # the blocksparse backward scatters its contractions back
            f_uc = self._dyn_u_cols_fn(ru_runs, uc_runs)
            n_ru = sum(b - a for a, b in ru_runs)
            n_uc = sum(b - a for a, b in uc_runs)
            Bs = jax.vmap(jac(f_uc, 1, n_ru, n_uc))(
                Xs, _slice_rows(U, uc_runs, 1), U, p_stage
            )
        Jxp = jax.vmap(jac(rho_x, 0, n_gx, nx))(Xs, U, p_stage)
        Jup = jax.vmap(jac(rho_u, 1, n_gu, self.ocp.nu))(Xs, U, p_stage)

        p_term = {k: v[ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        Jt = jax.jacfwd(self.ocp.terminal_residual)(X[ns], p_term)
        return dict(Sx=Sx, Bs=Bs, Jxp=Jxp, Jup=Jup, rho=rho, rt=rt, Jt=Jt,
                    d=F - X[1:])

    def _linearize_light(self, X, U, params):
        """Values-only linearization for opts.linearize_fused_backward:
        residuals, defects, and the terminal Jacobian — the stage
        Jacobians are formed inside the backward scan instead of being
        materialized here (the backward consumes (x, u, p) per node)."""
        ns = self.ocp.ns
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        F = jax.vmap(lambda x, u, p: self.ocp.step(x, u, p, dt))(
            X[:ns], U, p_stage
        )
        rho = jax.vmap(self._stage_rho)(X[:ns], U, p_stage)
        p_term = {k: v[ns] for k, v in params.items()}
        rt = self.ocp.terminal_residual(X[ns], p_term)
        Jt = jax.jacfwd(self.ocp.terminal_residual)(X[ns], p_term)
        return dict(rho=rho, rt=rt, Jt=Jt, d=F - X[1:])

    # ---------- backward Riccati sweep (reverse scan) ----------

    def _backward(self, lin, mu):
        nx, nu = self.ocp.nx, self.ocp.nu
        dtype = lin["rho"].dtype

        Vx_T = 2.0 * lin["Jt"].T @ lin["rt"]
        Vxx_T = 2.0 * lin["Jt"].T @ lin["Jt"]

        I_u = jnp.eye(nu, dtype=dtype)

        def node(carry, inp):
            Vx, Vxx, dV1, dV2 = carry
            A, B, Jx, Ju, rho, d = inp
            # cost quadratics (GN)
            lx = 2.0 * Jx.T @ rho
            lu = 2.0 * Ju.T @ rho
            lxx = 2.0 * Jx.T @ Jx
            luu = 2.0 * Ju.T @ Ju
            lux = 2.0 * Ju.T @ Jx
            # defect-aware chain: value gradient evaluated at f(x,u)=x⁺+d
            Vx_d = Vx + Vxx @ d
            Qx = lx + A.T @ Vx_d
            Qu = lu + B.T @ Vx_d
            Qxx = lxx + A.T @ Vxx @ A
            Quu = luu + B.T @ Vxx @ B + mu * I_u
            Qux = lux + B.T @ Vxx @ A
            # gains (Quu is SPD by GN construction + mu)
            rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
            if self.opts.quu_solver == "schur":
                kK = -spd_solve(Quu, rhs)
            else:
                chol = jax.scipy.linalg.cho_factor(Quu)
                kK = -jax.scipy.linalg.cho_solve(chol, rhs)
            k, K = kK[:, 0], kK[:, 1:]
            # value recursion — full Tassa form. The lane-major hot path
            # uses the cheaper Schur-complement collapse (Quu k = −Qu);
            # here, on the AL path, Quu conditioning reaches ~rho (1e8)
            # and the residual Quu k + Qu is no longer negligible — the
            # general form keeps the f64 offline solves at AL tolerance.
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            dV1_new = dV1 + k @ Qu
            dV2_new = dV2 + 0.5 * k @ Quu @ k
            return (Vx_new, Vxx_new, dV1_new, dV2_new), (k, K)

        zero = jnp.zeros((), dtype)
        (_, _, dV1, dV2), (ks, Ks) = jax.lax.scan(
            node,
            (Vx_T, Vxx_T, zero, zero),
            (lin["A"], lin["B"], lin["Jx"], lin["Ju"], lin["rho"], lin["d"]),
            reverse=True,
        )
        return ks, Ks, dV1, dV2

    # ---------- lane-major batched backward (the TPU hot path) ----------
    #
    # A hand-written Pallas kernel for this sweep was built, measured, and
    # RETIRED in round 2: the XLA lane-major path runs the sweep at
    # 0.79 TFLOP/s — above the isolated lane-major contraction ceiling
    # measured on the same shapes (0.46 TFLOP/s, tools/roofline.py),
    # because XLA's reduce fusions share operand reads across the ~10
    # per-node contractions. The kernel's VMEM-resident value function
    # saved HBM traffic that was never the bottleneck (io floor ~1 ms of a
    # 30 ms sweep) while its unrolled broadcast-FMA chains spilled ~46 MB
    # (2× slower end-to-end). History: `git log -- solvers/pallas_backward.py`.

    def _backward_lanemajor(self, lin, mu, lin_lane_major=False,
                            fused_inputs=None):
        """Backward Riccati sweep for a WHOLE BATCH at once, with the batch
        on the minor (lane) dimension.

        `lin` leaves carry a leading batch axis (from vmap'ed _linearize):
        A (B, ns, nx, nx) etc. A batch-first batched matmul is lowered as B
        independent 37×37 MXU ops at ~2% tile utilization (measured
        ~830 GFLOP/s); transposing the batch to the last axis turns every
        contraction into a fused broadcast-multiply-reduce at full lane
        occupancy. Returns batch-first (ks (B,ns,nu), Ks (B,ns,nu,nx),
        dV1 (B,), dV2 (B,))."""
        nx, nu = self.ocp.nx, self.ocp.nu
        dtype = lin["rho"].dtype

        def to_lm(x):  # (B, ns, ...) -> (ns, ..., B)
            return jnp.moveaxis(x, 0, -1)

        sliced_lin = "Sx" in lin  # opts.linearize_sliced emission
        if not sliced_lin and fused_inputs is None:
            A = to_lm(lin["A"])
            Bm = to_lm(lin["B"])
            Jx = to_lm(lin["Jx"])
            Ju = to_lm(lin["Ju"])
        if lin_lane_major:
            # everything but d already emitted lane-major (vmap
            # out_axes=-1 in _iteration_batch)
            rho, Jt, rt = lin["rho"], lin["Jt"], lin["rt"]
        else:
            rho = to_lm(lin["rho"])
            Jt = to_lm(lin["Jt"])
            rt = to_lm(lin["rt"])
        d = to_lm(lin["d"])
        Vxx_T = 2.0 * lm_matmul_tn(Jt, Jt)
        Vx_T = 2.0 * lm_matvec_tn(Jt, rt)

        Bsz = lin["d"].shape[0]
        eye_mu = mu * jnp.eye(nu, dtype=dtype)[:, :, None]
        zero = jnp.zeros((Bsz,), dtype)

        # note: the GN quadratics are computed INSIDE the scan — hoisting
        # them out (node-parallel broadcast-reduce) measured SLOWER on TPU
        # (36.9 ms vs 28.6 ms backward at B=1024); XLA's in-scan fusion of
        # the (nr × n) contractions wins. The combined-[A|B] contraction
        # and scan unroll variants also measured slower (−7% / −15% at
        # B=1024, tools/bench_backward_variants.py) — split row-pruned is
        # the production shape.
        combined = self.opts.backward_contract == "combined"
        xr, ur = self.ocp.residual_x_rows, self.ocp.residual_u_rows
        dxr = self.ocp.dynamics_x_rows
        dur = self.ocp.dynamics_u_rows
        blocksparse = sliced_lin or fused_inputs is not None or (
            self.opts.backward_contract == "blocksparse"
            and dxr is not None and dur is not None
            and xr is not None and ur is not None
        )
        pruned = (
            self.opts.gram_row_pruning
            and xr is not None and ur is not None
            and not combined and not blocksparse
        )
        if pruned:
            # Gram products over the declared-nonzero row sets only; rows
            # outside a set have identically-zero Jacobian there (enforced
            # by tests/test_analytic_jac.py) and contribute nothing.
            xr_l, ur_l = list(xr), list(ur)
            both = [r for r in xr_l if r in set(ur_l)]
            xu_in_x = np.asarray([xr_l.index(r) for r in both], np.int32)
            xu_in_u = np.asarray([ur_l.index(r) for r in both], np.int32)

        def chain(carry, Qx, Qu, Qxx, Quu, Qux):
            Vx, Vxx, dV1, dV2 = carry
            iQ = lm_spd_inverse(Quu)
            k = -lm_matvec(iQ, Qu)               # (nu, B)
            K = -lm_matmul(iQ, Qux)              # (nu, nx, B)
            # gains solve the SAME regularized Quu that enters the value
            # recursion, so Quu k = −Qu exactly and the general Tassa-form
            # update collapses (KᵀQuuK + KᵀQux + QuxᵀK = QuxᵀK etc.) —
            # dropping the KᵀQuu(·) products saves ~65k MACs/node:
            #   Vx⁺  = Qx + Quxᵀk,  Vxx⁺ = Qxx + QuxᵀK,
            #   ΔV₁ += kᵀQu,        ΔV₂ += ½kᵀQuu k = −½kᵀQu
            kQu = jnp.sum(k * Qu, axis=0)
            Vx_new = Qx + lm_matvec_tn(Qux, k)
            Vxx_new = Qxx + lm_matmul_tn(Qux, K)
            Vxx_new = 0.5 * (Vxx_new + lm_transpose(Vxx_new))
            dV1_new = dV1 + kQu
            dV2_new = dV2 - 0.5 * kQu
            return (Vx_new, Vxx_new, dV1_new, dV2_new), (k, K)

        def q_terms(carry, A_, B_, lx, lu, lxx, luu, lux, d_):
            Vx, Vxx = carry[0], carry[1]
            Vx_d = Vx + lm_matvec(Vxx, d_)
            Qx = lx + lm_matvec_tn(A_, Vx_d)
            Qu = lu + lm_matvec_tn(B_, Vx_d)
            VA = lm_matmul(Vxx, A_)
            VB = lm_matmul(Vxx, B_)
            Qxx = lxx + lm_matmul_tn(A_, VA)
            Quu = luu + lm_matmul_tn(B_, VB) + eye_mu
            Qux = lux + lm_matmul_tn(B_, VA)
            return Qx, Qu, Qxx, Quu, Qux

        if blocksparse:
            # Integrator structure: A = I + S with S nonzero only on the
            # declared dynamics_x_rows (contiguous runs → static slices),
            # and B nonzero only on dynamics_u_rows. Every chain
            # contraction then runs over the live rows only:
            #   VA  = V + V[:,rx] Sx            AᵀM = M + Sxᵀ M[rx]
            #   Quu = luu + Bsᵀ (V[ru,ru] Bs)   BᵀM = Bsᵀ M[ru]
            # For SRBD (rx=22, ru=18 of nx=37) this cuts the nx³ q-terms
            # ~2×; with sliced-row Grams the whole sweep is ~2× fewer
            # FLOPs than the dense split path. All row selections are
            # concatenations of static slices — no gathers, no scatters.
            rx_runs = _contiguous_runs(dxr)
            ru_runs = _contiguous_runs(dur)
            gx_runs = _contiguous_runs(xr)
            gu_runs = _contiguous_runs(ur)
            both = sorted(set(xr) & set(ur))
            b_runs = _contiguous_runs(both) if both else None
            # positions of `both` within the pruned row stacks: the pruned
            # stacks are concatenations of runs, so positions are runs too
            xr_l, ur_l = sorted(xr), sorted(ur)
            bx_runs = (
                _contiguous_runs([xr_l.index(r) for r in both])
                if both else None
            )
            bu_runs = (
                _contiguous_runs([ur_l.index(r) for r in both])
                if both else None
            )
            eye_rx = _slice_rows(jnp.eye(nx, dtype=dtype), rx_runs, 0)
            uc_runs = self._u_col_runs()

            def node_ops(carry, Sx_, Bs_, Jxp_, Jup_, rxp_, rup_, d_):
                Vx, Vxx = carry[0], carry[1]
                lx = 2.0 * lm_matvec_tn(Jxp_, rxp_)
                lu = 2.0 * lm_matvec_tn(Jup_, rup_)
                lxx = 2.0 * lm_matmul_tn(Jxp_, Jxp_)
                luu = 2.0 * lm_matmul_tn(Jup_, Jup_)
                if both:
                    lux = 2.0 * lm_matmul_tn(
                        _slice_rows(Jup_, bu_runs, 0),
                        _slice_rows(Jxp_, bx_runs, 0),
                    )
                else:
                    lux = jnp.zeros((nu, nx, Bsz), dtype)
                Vx_d = Vx + lm_matvec(Vxx, d_)
                Qx = lx + Vx_d + lm_matvec_tn(Sx_, _slice_rows(Vx_d, rx_runs, 0))
                Qu_c = lm_matvec_tn(Bs_, _slice_rows(Vx_d, ru_runs, 0))
                VA = Vxx + lm_matmul(_slice_rows(Vxx, rx_runs, 1), Sx_)
                Qxx = lxx + VA + lm_matmul_tn(Sx_, _slice_rows(VA, rx_runs, 0))
                V_uu = _slice_rows(_slice_rows(Vxx, ru_runs, 0), ru_runs, 1)
                Quu_c = lm_matmul_tn(Bs_, lm_matmul(V_uu, Bs_))
                Qux_c = lm_matmul_tn(Bs_, _slice_rows(VA, ru_runs, 0))
                if uc_runs is not None:
                    # Bs_ carries only the declared-live columns
                    # (ocp.dynamics_u_cols); scatter the B-chain terms back
                    # into the full input dimension — the residual Grams
                    # (lu/luu/lux) still cover every input, so the Q-terms
                    # the gain solve sees are dense and exact
                    Qu_c = _scatter_rows(Qu_c, uc_runs, nu, 0)
                    Quu_c = _scatter_rows(
                        _scatter_rows(Quu_c, uc_runs, nu, 0), uc_runs, nu, 1
                    )
                    Qux_c = _scatter_rows(Qux_c, uc_runs, nu, 0)
                Qu = lu + Qu_c
                Quu = luu + Quu_c + eye_mu
                Qux = lux + Qux_c
                return chain(carry, Qx, Qu, Qxx, Quu, Qux)

            if fused_inputs is not None:
                # opts.linearize_fused_backward: form this node's sliced
                # Jacobians HERE, per lane — the scan consumes only
                # (x, u, p, rho-slices, d); the Jacobian block exists only
                # as scan-step temporaries, never as an HBM stack. Same
                # one-hot-tangent arithmetic as _linearize_sliced.
                Xb, Ub, Pb = fused_inputs          # batch-first
                ns_ = self.ocp.ns
                dt = self.ocp.dt

                def f_x(x, u, p):
                    return _slice_rows(self.ocp.step(x, u, p, dt), rx_runs, 0)

                def rho_x_f(x, u, p):
                    return _slice_rows(self._stage_rho(x, u, p), gx_runs, 0)

                def rho_u_f(x, u, p):
                    return _slice_rows(self._stage_rho(x, u, p), gu_runs, 0)

                lanes = dict(in_axes=(-1, -1, -1), out_axes=-1)
                form_A = jax.vmap(jax.jacfwd(f_x, argnums=0), **lanes)
                form_Jx = jax.vmap(jax.jacfwd(rho_x_f, argnums=0), **lanes)
                form_Ju = jax.vmap(jax.jacfwd(rho_u_f, argnums=1), **lanes)
                if uc_runs is None:
                    def f_u(x, u, p):
                        return _slice_rows(
                            self.ocp.step(x, u, p, dt), ru_runs, 0
                        )

                    form_B0 = jax.vmap(jax.jacfwd(f_u, argnums=1), **lanes)

                    def form_B(x_, u_, p_):
                        return form_B0(x_, u_, p_)
                else:
                    f_uc = self._dyn_u_cols_fn(ru_runs, uc_runs)
                    form_Bc = jax.vmap(
                        jax.jacfwd(f_uc, argnums=1),
                        in_axes=(-1, -1, -1, -1), out_axes=-1,
                    )

                    def form_B(x_, u_, p_):
                        return form_Bc(
                            x_, _slice_rows(u_, uc_runs, 0), u_, p_
                        )

                def node(carry, inp):
                    x_, u_, p_, rxp_, rup_, d_ = inp
                    Sx_ = form_A(x_, u_, p_) - eye_rx[:, :, None]
                    Bs_ = form_B(x_, u_, p_)
                    Jxp_ = form_Jx(x_, u_, p_)
                    Jup_ = form_Ju(x_, u_, p_)
                    return node_ops(
                        carry, Sx_, Bs_, Jxp_, Jup_, rxp_, rup_, d_
                    )

                xs = (
                    jnp.moveaxis(Xb[:, :ns_], 0, -1),      # (ns, nx, B)
                    jnp.moveaxis(Ub, 0, -1),               # (ns, nu, B)
                    {k: jnp.moveaxis(v[:, :ns_], 0, -1)
                     for k, v in Pb.items()},              # (ns, dim, B)
                    _slice_rows(rho, gx_runs, 1),
                    _slice_rows(rho, gu_runs, 1),
                    d,
                )
            elif sliced_lin:
                # linearize already emitted exactly these operands
                lm = (lambda x: x) if lin_lane_major else to_lm
                xs = (
                    lm(lin["Sx"]), lm(lin["Bs"]),
                    lm(lin["Jxp"]), lm(lin["Jup"]),
                    _slice_rows(rho, gx_runs, 1),
                    _slice_rows(rho, gu_runs, 1),
                    d,
                )
            else:
                Bm_s = _slice_rows(Bm, ru_runs, 1)
                if uc_runs is not None:
                    Bm_s = _slice_rows(Bm_s, uc_runs, 2)
                xs = (
                    _slice_rows(A, rx_runs, 1) - eye_rx[None, :, :, None],
                    Bm_s,
                    _slice_rows(Jx, gx_runs, 1),
                    _slice_rows(Ju, gu_runs, 1),
                    _slice_rows(rho, gx_runs, 1),
                    _slice_rows(rho, gu_runs, 1),
                    d,
                )

            if fused_inputs is None:
                def node(carry, inp):
                    return node_ops(carry, *inp)
        elif combined:
            def node(carry, inp):
                A_, B_, Jx_, Ju_, rho_, d_ = inp
                Vx_d = carry[0] + lm_matvec(carry[1], d_)
                # one Gram + one chain contraction over z = [x|u]
                Jz = jnp.concatenate([Jx_, Ju_], axis=1)   # (nr, nz, B)
                W = jnp.concatenate([A_, B_], axis=1)      # (nx, nz, B)
                Qz = 2.0 * lm_matvec_tn(Jz, rho_) + lm_matvec_tn(W, Vx_d)
                VW = lm_matmul(carry[1], W)                # (nx, nz, B)
                Qzz = 2.0 * lm_matmul_tn(Jz, Jz) + lm_matmul_tn(W, VW)
                return chain(
                    carry, Qz[:nx], Qz[nx:],
                    Qzz[:nx, :nx], Qzz[nx:, nx:] + eye_mu, Qzz[nx:, :nx],
                )
            xs = (A, Bm, Jx, Ju, rho, d)
        elif pruned:
            def node(carry, inp):
                A_, B_, Jxp_, Jup_, rxp_, rup_, d_ = inp
                lx = 2.0 * lm_matvec_tn(Jxp_, rxp_)
                lu = 2.0 * lm_matvec_tn(Jup_, rup_)
                lxx = 2.0 * lm_matmul_tn(Jxp_, Jxp_)
                luu = 2.0 * lm_matmul_tn(Jup_, Jup_)
                lux = 2.0 * lm_matmul_tn(
                    jnp.take(Jup_, xu_in_u, axis=0),
                    jnp.take(Jxp_, xu_in_x, axis=0),
                )
                return chain(
                    carry, *q_terms(carry, A_, B_, lx, lu, lxx, luu, lux, d_)
                )
            xs = (
                A, Bm,
                jnp.take(Jx, np.asarray(xr_l, np.int32), axis=1),
                jnp.take(Ju, np.asarray(ur_l, np.int32), axis=1),
                jnp.take(rho, np.asarray(xr_l, np.int32), axis=1),
                jnp.take(rho, np.asarray(ur_l, np.int32), axis=1),
                d,
            )
        else:
            def node(carry, inp):
                A_, B_, Jx_, Ju_, rho_, d_ = inp
                lx = 2.0 * lm_matvec_tn(Jx_, rho_)
                lu = 2.0 * lm_matvec_tn(Ju_, rho_)
                lxx = 2.0 * lm_matmul_tn(Jx_, Jx_)
                luu = 2.0 * lm_matmul_tn(Ju_, Ju_)
                lux = 2.0 * lm_matmul_tn(Ju_, Jx_)
                return chain(
                    carry, *q_terms(carry, A_, B_, lx, lu, lxx, luu, lux, d_)
                )
            xs = (A, Bm, Jx, Ju, rho, d)

        ns_total = self.ocp.ns
        if self.opts.backward_pair_nodes and ns_total % 2 == 0:
            # two-node-fused chain (opts.backward_pair_nodes): one scan
            # step advances the value function across TWO adjacent nodes
            # — identical arithmetic, half the carry round-trips. In a
            # reverse scan the step's pair is (node 2k, node 2k+1);
            # process the HIGHER node first.
            def node_pair(carry, inp):
                inp_hi = jax.tree.map(lambda a: a[1], inp)
                inp_lo = jax.tree.map(lambda a: a[0], inp)
                carry, (k1, K1) = node(carry, inp_hi)
                carry, (k0, K0) = node(carry, inp_lo)
                return carry, (jnp.stack([k0, k1]), jnp.stack([K0, K1]))

            xs_pairs = jax.tree.map(
                lambda a: a.reshape((ns_total // 2, 2) + a.shape[1:]), xs
            )
            (_, _, dV1, dV2), (ks, Ks) = jax.lax.scan(
                node_pair, (Vx_T, Vxx_T, zero, zero), xs_pairs,
                reverse=True,
                unroll=self.opts.backward_unroll,
            )
            ks = ks.reshape((ns_total,) + ks.shape[2:])
            Ks = Ks.reshape((ns_total,) + Ks.shape[2:])
        else:
            (_, _, dV1, dV2), (ks, Ks) = jax.lax.scan(
                node, (Vx_T, Vxx_T, zero, zero), xs,
                reverse=True,
                unroll=self.opts.backward_unroll,
            )
        # back to batch-first
        return (
            jnp.moveaxis(ks, -1, 0),             # (B, ns, nu)
            jnp.moveaxis(Ks, -1, 0),             # (B, ns, nu, nx)
            dV1,
            dV2,
        )

    # ---------- natively batched solve (uses the lane-major backward) ----

    def _iteration_batch(self, state: _IterState, x0, params):
        """One DDP iteration for a whole batch: vmapped linearization and
        rollouts, lane-major backward, per-member α selection and masked
        updates (mirrors vmap(solve) semantics member-for-member)."""
        opts = self.opts
        sliced = (
            opts.linearize_sliced
            and opts.backward_contract == "blocksparse"
            and not opts.analytic_jacobians
            and self.ocp.dynamics_x_rows is not None
            and self.ocp.dynamics_u_rows is not None
            and self.ocp.residual_x_rows is not None
            and self.ocp.residual_u_rows is not None
        )
        fused = (
            sliced
            and opts.linearize_fused_backward
            and opts.linearize_precision != "bf16"
        )
        lane_out = sliced and opts.linearize_lane_out and not fused
        if fused:
            lin = jax.vmap(self._linearize_light)(state.X, state.U, params)
        elif lane_out:
            # emit the backward's operands lane-major straight out of the
            # vmap (out_axes=-1) — the scan consumes them as-is, skipping
            # the moveaxis copies; d stays batch-first (rollout/merit and
            # the fan compaction gather consume it per-member)
            out_axes = dict(Sx=-1, Bs=-1, Jxp=-1, Jup=-1, rho=-1,
                            rt=-1, Jt=-1, d=0)
            lin = jax.vmap(
                lambda x, u, p: self._linearize(x, u, p, sliced=True),
                out_axes=out_axes,
            )(state.X, state.U, params)
        else:
            lin = jax.vmap(
                lambda x, u, p: self._linearize(x, u, p, sliced=sliced)
            )(state.X, state.U, params)
        mu = jnp.asarray(opts.mu0, state.X.dtype)
        ks, Ks, dV1, dV2 = self._backward_lanemajor(
            lin, mu, lin_lane_major=lane_out,
            fused_inputs=(
                (state.X, state.U, params) if fused else None
            ),
        )

        nu_w = jnp.asarray(opts.defect_weight, state.X.dtype)
        D = jnp.sum(lin["d"] * lin["d"], axis=(1, 2))          # (B,)
        merit0 = state.cost + nu_w * D

        K_ls = opts.parallel_line_search_width
        alphas = opts.alpha_0 * (
            opts.line_search_decrease_factor
            ** jnp.arange(K_ls, dtype=state.X.dtype)
        )
        vroll = jax.vmap(
            lambda x0_, X_, U_, k_, K_, d_, p_, a: self._rollout(
                x0_, X_, U_, k_, K_, d_, p_, a
            ),
            in_axes=(0, 0, 0, 0, 0, 0, 0, None),
        )
        vcost = jax.vmap(self.total_cost)

        def trial(a):
            Xn, Un = vroll(x0, state.X, state.U, ks, Ks, lin["d"], params, a)
            new_cost = vcost(Xn, Un, params)
            new_merit = new_cost + nu_w * (1.0 - a) ** 2 * D
            expected = -(a * dV1 + a**2 * dV2) + (2.0 * a - a**2) * nu_w * D
            ok = (
                ((merit0 - new_merit) >= opts.beta * jnp.maximum(expected, 1e-16))
                & jnp.isfinite(new_merit)
                & (a >= opts.alpha_converge_threshold)
            )
            return Xn, Un, new_cost, new_merit, ok

        active = ~state.converged

        # fast path: at warm steady state every active member accepts the
        # full step — try α₀ alone first and only fan out over the
        # backtracking α candidates if someone rejects it (lax.cond
        # executes exactly one branch at runtime)
        if opts.rollout_lane_major:
            # lane-major α₀ trial (opts.rollout_lane_major): batch on the
            # minor axis for the rollout + cost sweep; results transposed
            # back once (the fan/selection logic stays batch-first)
            def lmv(a):
                return jnp.moveaxis(a, 0, -1)

            a0_t = alphas[0]
            Xn_lm, Un_lm = self._rollout_lm(
                x0.T, lmv(state.X), lmv(state.U), lmv(ks), lmv(Ks),
                lmv(lin["d"]), {k: lmv(v) for k, v in params.items()},
                a0_t,
            )
            cost1 = self._total_cost_lm(
                Xn_lm, Un_lm, {k: lmv(v) for k, v in params.items()}
            )
            merit1 = cost1 + nu_w * (1.0 - a0_t) ** 2 * D
            exp1 = (
                -(a0_t * dV1 + a0_t**2 * dV2)
                + (2.0 * a0_t - a0_t**2) * nu_w * D
            )
            ok1 = (
                ((merit0 - merit1) >= opts.beta * jnp.maximum(exp1, 1e-16))
                & jnp.isfinite(merit1)
                & (a0_t >= opts.alpha_converge_threshold)
            )
            X1 = jnp.moveaxis(Xn_lm, -1, 0)
            U1 = jnp.moveaxis(Un_lm, -1, 0)
        else:
            X1, U1, cost1, merit1, ok1 = trial(alphas[0])

        def no_fan(_):
            return X1, U1, cost1, merit1, ok1

        # deepening is only WORTH it while the reduction the model can
        # still deliver at the chunk's α is RESOLVABLE above the merit's
        # floating-point noise floor (~32·eps·merit for the ~10³-term
        # merit sum). A converged member predicts reductions below that
        # floor — its line-search failure IS the stopping signal
        # (ddp.py:26-28 semantics) and deep backtracking would burn
        # max_line_search_steps rollouts per solve for nothing — measured
        # 2.4× throughput loss at B=4096 without this gate. A genuinely
        # stuck member (hard push: expected0 ~1e6) deepens as far as the
        # noise floor allows (~18 halvings in f32), which is the regime
        # the reference's backtrack-to-1e-12 exists for.
        a0 = jnp.asarray(opts.alpha_0, state.X.dtype)
        expected0 = -(a0 * dV1 + a0**2 * dV2) + (2.0 * a0 - a0**2) * nu_w * D
        noise = jnp.maximum(
            32.0 * jnp.finfo(state.X.dtype).eps * jnp.maximum(merit0, 1.0),
            opts.cost_reduction_ths * jnp.maximum(merit0, 1.0),
        )
        # a member that rejected α₀ with expected0 BELOW the noise floor
        # cannot resolve any reduction at smaller α either (expected(α) is
        # increasing in α here), so fanning it is pure waste — its
        # rejection IS the convergence signal. Only members above the
        # floor enter the fan at all; at serving batch sizes this keeps
        # the per-iteration wave of just-converging members (which
        # previously forced one full-batch width-K chunk every iteration)
        # off the backtracking path entirely.
        worth0 = expected0 > noise
        need = active & ~ok1 & worth0
        all_accept = ~jnp.any(need)

        def run_fan(data):
            # chunked deepening: evaluate width-K fans of ever-smaller α
            # until every active member has an accepted step or α has
            # backtracked past the reference's 1e-12 floor
            # (dsrbd_example.py:57, ddp.py:26-28) — a hard-push cold member
            # takes a genuinely small accepted step instead of being
            # silently declared converged by a truncated fan.
            # The already-computed α₀ trial seeds the loop, so a member
            # that accepts the full step gets BIT-identical results on
            # the fast path and the fan path (a faulty neighbor flipping
            # the branch cannot perturb healthy members).
            # `data` carries a (possibly compacted, see `fan`) batch.
            (x0b, Xb0, Ub0, ksb, Ksb, db, paramsb, costb0, merit0b, Db,
             dV1b, dV2b, expected0b, noiseb, activeb,
             X1b, U1b, cost1b, merit1b, ok1b) = data
            n_chunks = -(-opts.max_line_search_steps // K_ls)

            def trial_b(a):
                Xn, Un = jax.vmap(
                    lambda x0_, X_, U_, k_, K_, d_, p_: self._rollout(
                        x0_, X_, U_, k_, K_, d_, p_, a
                    )
                )(x0b, Xb0, Ub0, ksb, Ksb, db, paramsb)
                new_cost = jax.vmap(self.total_cost)(Xn, Un, paramsb)
                new_merit = new_cost + nu_w * (1.0 - a) ** 2 * Db
                expected = (
                    -(a * dV1b + a**2 * dV2b) + (2.0 * a - a**2) * nu_w * Db
                )
                ok = (
                    ((merit0b - new_merit)
                     >= opts.beta * jnp.maximum(expected, 1e-16))
                    & jnp.isfinite(new_merit)
                    & (a >= opts.alpha_converge_threshold)
                )
                return Xn, Un, new_cost, new_merit, ok

            def cond(s):
                c, _, _, _, _, found = s
                unfound = activeb & ~found
                alpha_c = jnp.asarray(
                    opts.line_search_decrease_factor, state.X.dtype
                ) ** (c * K_ls).astype(state.X.dtype)
                worth = expected0b * alpha_c > noiseb
                return (c < n_chunks) & jnp.any(unfound & worth)

            def body(s):
                c, Xb, Ub, costb, meritb, found = s
                # chunk c covers α₀·f^(cK+1) .. α₀·f^(cK+K) — α₀ itself
                # was evaluated by the fast-path trial that seeded `found`
                al = alphas * (
                    opts.line_search_decrease_factor
                    ** (c * K_ls + 1).astype(state.X.dtype)
                )
                Xs, Us, costs, merits, oks = jax.vmap(trial_b)(al)  # (K, b, ..)
                idx = jnp.argmax(oks, axis=0)                       # (b,)

                def pick(arr):  # (K, b, ...) -> (b, ...)
                    return jnp.take_along_axis(
                        arr,
                        idx.reshape((1,) + idx.shape + (1,) * (arr.ndim - 2)),
                        axis=0,
                    )[0]

                hit = jnp.any(oks, axis=0) & ~found                 # (b,)

                def sel(new, old):
                    m = hit.reshape(hit.shape + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                return (
                    c + 1,
                    sel(pick(Xs), Xb),
                    sel(pick(Us), Ub),
                    jnp.where(hit, jnp.take_along_axis(costs, idx[None], axis=0)[0], costb),
                    jnp.where(hit, jnp.take_along_axis(merits, idx[None], axis=0)[0], meritb),
                    found | hit,
                )

            def sel0(new, old):
                m = ok1b.reshape(ok1b.shape + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            init = (
                jnp.asarray(0, jnp.int32),
                sel0(X1b, Xb0), sel0(U1b, Ub0),
                jnp.where(ok1b, cost1b, costb0),
                jnp.where(ok1b, merit1b, merit0b),
                ok1b,
            )
            _, Xb, Ub, costb, meritb, found = jax.lax.while_loop(
                cond, body, init
            )
            return Xb, Ub, costb, meritb, found

        full_data = (
            x0, state.X, state.U, ks, Ks, lin["d"], params, state.cost,
            merit0, D, dV1, dV2, expected0, noise, active,
            X1, U1, cost1, merit1, ok1,
        )
        Bsz = state.cost.shape[0]
        M = opts.line_search_compact

        def fan(_):
            if not (0 < M < Bsz):
                return run_fan(full_data)

            def compact(_):
                # gather ONLY the rejecting members: the deepening fan then
                # costs width × M lanes instead of width × B — at serving
                # batch sizes a handful of hard-pushed members no longer
                # makes the whole fleet pay the backtracking rollouts.
                # Dead slots (fewer than M rejections) gather row `Bsz`
                # with mode="fill": activeb=False parks them; scatters of
                # their (garbage) results are dropped via the
                # out-of-bounds index.
                idx = jnp.nonzero(need, size=M, fill_value=Bsz)[0]

                def g(a):
                    # gather on a FLATTENED trailing axis: a direct 4D
                    # gather of the (B, ns, nu, nx) gain tensor is one
                    # fused pad+gather whose (8,128)-tiled stack buffer
                    # pads nx 37→128 and blows the 16 MB scoped-vmem
                    # limit at any M; 2D (B, prod) gathers tile cleanly
                    if a.ndim > 2:
                        flat = jnp.take(
                            a.reshape(a.shape[0], -1), idx, axis=0,
                            mode="fill", fill_value=0,
                        )
                        return flat.reshape((M,) + a.shape[1:])
                    return jnp.take(a, idx, axis=0, mode="fill",
                                    fill_value=0)

                # dead slots gather fill_value=0 for every leaf, so
                # activeb=False parks them (cond never considers them) and
                # ok1b=False keeps their garbage out of the seeds
                sub = jax.tree.map(g, full_data)
                Xs, Us, costs, merits, found_s = run_fan(sub)

                def scat(base, vals):
                    return base.at[idx].set(vals, mode="drop")

                def sel0(new, old):
                    m = ok1.reshape(ok1.shape + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                return (
                    scat(sel0(X1, state.X), Xs),
                    scat(sel0(U1, state.U), Us),
                    scat(jnp.where(ok1, cost1, state.cost), costs),
                    scat(jnp.where(ok1, merit1, merit0), merits),
                    scat(ok1, found_s),
                )

            return jax.lax.cond(
                jnp.sum(need) <= M,
                compact,
                lambda _: run_fan(full_data),
                None,
            )

        Xn, Un, new_cost, new_merit, accepted = jax.lax.cond(
            all_accept, no_fan, fan, None
        )

        upd = accepted & active
        merit_red = merit0 - new_merit
        conv_now = (~accepted) | (
            merit_red <= opts.cost_reduction_ths * jnp.maximum(merit0, 1.0)
        )

        def sel(new, old):
            mask = upd.reshape(upd.shape + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        return _IterState(
            X=sel(Xn, state.X),
            U=sel(Un, state.U),
            cost=jnp.where(upd, new_cost, state.cost),
            converged=jnp.where(active, conv_now, state.converged),
            it=jnp.where(active, state.it + 1, state.it),
        )

    def compaction_levels(self, Bsz: int):
        """Compacted sub-batch sizes [B/2, B/4, …] that the active-set
        compaction will actually use for a batch of size Bsz: one per
        `opts.active_compact_levels`, skipping any level whose sub-batch
        would drop below 32 lanes (a sub-32 gather wastes the 8×128
        vector registers and the gather/scatter overhead dominates).
        Empty ⇒ compaction is a no-op at this batch size — callers that
        rely on the compacted path engaging should check this."""
        levels = []
        M = Bsz
        for _ in range(self.opts.active_compact_levels):
            M //= 2
            if M >= 32:
                levels.append(M)
        return levels

    def _iteration_compacted(self, state: _IterState, x0, params):
        """Active-set compaction (opts.active_compact_levels): when the
        still-active members fit in B/2^l lanes, gather just those, run
        the ordinary `_iteration_batch` on the compacted sub-batch, and
        scatter the results back. The while_loop in `solve_batch` runs to
        the SLOWEST member, so at warm steady state the last iterations
        otherwise drag every converged member through linearize +
        backward + trial; the gather/scatter costs ~1 ms of HBM traffic
        against ~40 ms of iteration compute at B=4096. Per-member
        arithmetic is lane-position independent, so results match the
        full-batch path to ROUNDING (≈1e-15 rel on f64): wrapping the
        iteration body in nested lax.cond changes XLA's fusion/codegen,
        so bit-identity does NOT hold — iteration counts and convergence
        flags DO match exactly (tests/test_batched_solver.py::
        TestActiveCompaction). Unfilled gather slots read zeros
        (mode="fill"): their NaN/garbage trial results fail the
        finite/worth gates inside the iteration (they never trigger the
        fan) and their outputs are dropped by the out-of-bounds scatter
        index (mode="drop")."""
        Bsz = state.cost.shape[0]
        active = ~state.converged
        count = jnp.sum(active)
        levels = self.compaction_levels(Bsz)

        def full(_):
            return self._iteration_batch(state, x0, params)

        def make_compact(M):
            def run(_):
                idx = jnp.nonzero(active, size=M, fill_value=Bsz)[0]

                def g(a):
                    # flatten >2D gathers: a fused pad+gather of a
                    # (B, ns, nu, nx)-style tensor pads the minor dim to
                    # 128 in its stack buffer and can blow the 16 MB
                    # scoped-vmem limit (same pitfall as the fan
                    # compaction)
                    if a.ndim > 2:
                        flat = jnp.take(
                            a.reshape(a.shape[0], -1), idx, axis=0,
                            mode="fill", fill_value=0,
                        )
                        return flat.reshape((M,) + a.shape[1:])
                    return jnp.take(a, idx, axis=0, mode="fill",
                                    fill_value=0)

                sub = _IterState(
                    X=g(state.X), U=g(state.U), cost=g(state.cost),
                    converged=g(state.converged), it=g(state.it),
                )
                out = self._iteration_batch(
                    sub, g(x0), {k: g(v) for k, v in params.items()}
                )

                def scat(base, vals):
                    if vals.ndim > 2:
                        flat = base.reshape(base.shape[0], -1).at[idx].set(
                            vals.reshape(vals.shape[0], -1), mode="drop"
                        )
                        return flat.reshape(base.shape)
                    return base.at[idx].set(vals, mode="drop")

                return _IterState(
                    X=scat(state.X, out.X),
                    U=scat(state.U, out.U),
                    cost=scat(state.cost, out.cost),
                    converged=scat(state.converged, out.converged),
                    it=scat(state.it, out.it),
                )

            return run

        # nested dispatch picking the SMALLEST level that fits: fold the
        # levels largest→outermost-smallest so e.g. count ≤ B/4 routes to
        # the B/4 body, count ≤ B/2 to B/2, else the full-batch body
        branch = full
        for M in levels:
            branch = (
                lambda br, MM: (
                    lambda _: jax.lax.cond(
                        count <= MM, make_compact(MM), br, None
                    )
                )
            )(branch, M)
        return branch(None)

    def solve_batch(self, sols: DDPSolution, x0, params) -> DDPSolution:
        """Batched MS-DDP solve over a leading scenario axis. Semantically
        equivalent to `vmap(solve)` (same per-member α selection, masked
        convergence) but with the backward sweep executed lane-major —
        the TPU hot path used by the MPC fleet runtime."""
        if (
            self.opts.riccati_mode != "sequential"
            or self.opts.forward_pass != "nonlinear"
        ):
            return jax.vmap(self.solve)(sols, x0, params)
        opts = self.opts
        with jax.default_matmul_precision("highest"):
            # node-0 pin, same rationale as _solve_impl
            X_pinned = sols.X.at[:, 0].set(x0)
            cost0 = jax.vmap(self.total_cost)(X_pinned, sols.U, params)
            Bsz = cost0.shape[0]
            state = _IterState(
                X=X_pinned, U=sols.U, cost=cost0,
                converged=jnp.zeros((Bsz,), bool),
                it=jnp.zeros((Bsz,), jnp.int32),
            )

            def cond(s):
                return jnp.any((~s.converged) & (s.it < opts.max_iters))

            def body(s):
                if opts.active_compact_levels > 0:
                    return self._iteration_compacted(s, x0, params)
                return self._iteration_batch(s, x0, params)

            final = jax.lax.while_loop(cond, body, state)

            defects = jax.vmap(self._true_defects)(final.X, final.U, params)
            defect = jnp.max(jnp.abs(defects), axis=(1, 2))
            return DDPSolution(
                X=final.X, U=final.U, cost=final.cost,
                converged=final.converged, iterations=final.it,
                defect_norm=defect,
            )

    # ---------- parallel (associative-scan) Riccati backward ----------

    def _backward_associative(self, lin, mu):
        """Backward value recursion as a suffix associative scan —
        ⌈log₂(ns+1)⌉ stages of batched (nx×nx) algebra instead of ns
        sequential Riccati steps (PAPERS.md:9; Särkkä-style parallel LQT).

        Element e = (A, b, C, η, J) represents the conditional value map
            V_n(δx) = ½δxᵀJδx + ηᵀδx
                      + min_z [ ½(z − Aδx − b)ᵀC⁺(z − Aδx − b) + V_m(z) ]
        built per node (after eliminating the cost cross-term lux and
        absorbing the input gradient and multiple-shooting defect into b):
            R̃ = luu + μI,  Ã = A − B R̃⁻¹ lux
            J = lxx − luxᵀ R̃⁻¹ lux,  η = lx − luxᵀ R̃⁻¹ lu
            b = d − B R̃⁻¹ lu,        C = B R̃⁻¹ Bᵀ
        The terminal node is the constant element (A=0, b=0, C=0, J=Vxxᵀ,
        η=Vxᵀ). The suffix composition at node n yields (J, η) = (Vxx_n,
        Vx_n); gains are then recomputed per node in parallel. Only
        (I + C J)-type solves appear, so singular C (rank ≤ nu) is fine."""
        nx, nu, ns = self.ocp.nx, self.ocp.nu, self.ocp.ns
        dtype = lin["rho"].dtype
        A, B, Jx, Ju, rho, d = (
            lin["A"], lin["B"], lin["Jx"], lin["Ju"], lin["rho"], lin["d"]
        )

        # per-node cost quadratics (GN)
        lx = 2.0 * jnp.einsum("nrx,nr->nx", Jx, rho)
        lu = 2.0 * jnp.einsum("nru,nr->nu", Ju, rho)
        lxx = 2.0 * jnp.einsum("nrx,nry->nxy", Jx, Jx)
        luu = 2.0 * jnp.einsum("nru,nrv->nuv", Ju, Ju)
        lux = 2.0 * jnp.einsum("nru,nrx->nux", Ju, Jx)

        if self.opts.quu_solver == "schur":
            chol_solve = spd_solve
        else:
            def chol_solve(Amat, rhs):
                c = jax.scipy.linalg.cholesky(Amat, lower=True)
                return jax.scipy.linalg.cho_solve((c, True), rhs)

        Rt = luu + mu * jnp.eye(nu, dtype=dtype)[None]
        rhs = jnp.concatenate([lu[:, :, None], lux, B.transpose(0, 2, 1)], axis=2)
        sol = jax.vmap(chol_solve)(Rt, rhs)
        Ri_lu = sol[:, :, 0]                 # R̃⁻¹ lu          (ns, nu)
        Ri_lux = sol[:, :, 1 : 1 + nx]       # R̃⁻¹ lux         (ns, nu, nx)
        Ri_Bt = sol[:, :, 1 + nx :]          # R̃⁻¹ Bᵀ          (ns, nu, nx)

        eA = A - jnp.einsum("nxu,nuy->nxy", B, Ri_lux)
        eJ = lxx - jnp.einsum("nux,nuy->nxy", lux, Ri_lux)
        eEta = lx - jnp.einsum("nux,nu->nx", lux, Ri_lu)
        eB = d - jnp.einsum("nxu,nu->nx", B, Ri_lu)
        eC = jnp.einsum("nxu,nuy->nxy", B, Ri_Bt)

        # terminal element
        Vx_T = 2.0 * lin["Jt"].T @ lin["rt"]
        Vxx_T = 2.0 * lin["Jt"].T @ lin["Jt"]
        zero_m = jnp.zeros((1, nx, nx), dtype)
        zero_v = jnp.zeros((1, nx), dtype)
        elems = dict(
            A=jnp.concatenate([eA, zero_m]),
            b=jnp.concatenate([eB, zero_v]),
            C=jnp.concatenate([eC, zero_m]),
            eta=jnp.concatenate([eEta, Vx_T[None]]),
            J=jnp.concatenate([eJ, Vxx_T[None]]),
        )

        eye = jnp.eye(nx, dtype=dtype)

        def combine(e1, e2):
            """e1 covers the earlier interval, e2 the suffix toward T."""
            # M = (I + C₁ J₂)⁻¹ appears as C₁-weighted resolvent
            CJ = jnp.einsum("...xy,...yz->...xz", e1["C"], e2["J"])
            M = jnp.linalg.solve(
                eye + CJ,
                jnp.concatenate(
                    [
                        e1["A"],
                        e1["C"],
                        (e1["b"] - jnp.einsum(
                            "...xy,...y->...x", e1["C"], e2["eta"]
                        ))[..., None],
                    ],
                    axis=-1,
                ),
            )
            MA1 = M[..., :, : e1["A"].shape[-1]]
            MC1 = M[..., :, e1["A"].shape[-1] : -1]
            Mb = M[..., :, -1]
            A12 = jnp.einsum("...xy,...yz->...xz", e2["A"], MA1)
            b12 = jnp.einsum("...xy,...y->...x", e2["A"], Mb) + e2["b"]
            C12 = (
                jnp.einsum(
                    "...xy,...zy->...xz",
                    jnp.einsum("...xy,...yz->...xz", e2["A"], MC1),
                    e2["A"],
                )
                + e2["C"]
            )
            # dual resolvent: (I + J₂C₁)⁻ᵀ pieces via J₂ M-forms
            J2MA1 = jnp.einsum("...xy,...yz->...xz", e2["J"], MA1)
            eta12 = (
                jnp.einsum(
                    "...yx,...y->...x",
                    MA1,
                    e2["eta"] + jnp.einsum("...xy,...y->...x", e2["J"], e1["b"]),
                )
                + e1["eta"]
            )
            J12 = (
                jnp.einsum("...yx,...yz->...xz", e1["A"], J2MA1) + e1["J"]
            )
            return dict(A=A12, b=b12, C=C12, eta=eta12, J=J12)

        # reverse=True internally flips the sequence and runs a forward
        # scan, so the binary op receives (later-interval, earlier-interval)
        # — swap into combine's (earlier, later) convention.
        suffix = jax.lax.associative_scan(
            lambda a, b: combine(b, a), elems, reverse=True, axis=0
        )
        Vxx = suffix["J"]       # (ns+1, nx, nx): V at each node
        Vx = suffix["eta"]      # (ns+1, nx)

        # gains per node, in parallel, from V at n+1
        Vxx1, Vx1 = Vxx[1:], Vx[1:]
        Vx_d = Vx1 + jnp.einsum("nxy,ny->nx", Vxx1, d)
        Qu = lu + jnp.einsum("nxu,nx->nu", B, Vx_d)
        Qux = lux + jnp.einsum(
            "nxu,nxy->nuy", B, jnp.einsum("nxy,nyz->nxz", Vxx1, A)
        )
        Quu = Rt + jnp.einsum(
            "nxu,nxv->nuv", B, jnp.einsum("nxy,nyu->nxu", Vxx1, B)
        )
        kK = -jax.vmap(chol_solve)(
            Quu, jnp.concatenate([Qu[:, :, None], Qux], axis=2)
        )
        ks, Ks = kK[:, :, 0], kK[:, :, 1:]
        dV1 = jnp.einsum("nu,nu->", ks, Qu)
        dV2 = 0.5 * jnp.einsum(
            "nu,nu->", ks, jnp.einsum("nuv,nv->nu", Quu, ks)
        )
        return ks, Ks, dV1, dV2

    # ---------- forward pass with defect contraction ----------

    def _rollout(self, x0, X, U, ks, Ks, d, params, alpha):
        dt = self.ocp.dt
        ns = self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params.items()}

        def node(xhat, inp):
            Xn, Un, kn, Kn, dn, pn = inp
            u = Un + alpha * kn + Kn @ (xhat - Xn)
            # multiple-shooting defect contraction: leave (1−α) of the gap
            # open so that α→0 recovers the current iterate exactly and α=1
            # yields a dynamically feasible trajectory (d = f(x,u) − x⁺)
            xnext = self.ocp.step(xhat, u, pn, dt) - (1.0 - alpha) * dn
            return xnext, (xhat, u)

        x_final, (Xs, Us) = jax.lax.scan(
            node, x0, (X[:ns], U, ks, Ks, d, p_stage),
            unroll=self.opts.rollout_unroll,
        )
        Xnew = jnp.concatenate([Xs, x_final[None]], axis=0)
        return Xnew, Us

    def _rollout_lm(self, x0_lm, X_lm, U_lm, ks_lm, Ks_lm, d_lm, params_lm,
                    alpha):
        """Lane-major batched rollout (opts.rollout_lane_major): identical
        arithmetic to vmap(_rollout) but with the batch on the minor (lane)
        axis — x0 (nx, B), X (ns+1, nx, B), gains (ns, nu, [nx,] B), params
        leaves (ns+1, dim, B). The per-node gain application becomes a
        lane-major broadcast-reduce (full lane occupancy over B) and every
        elementwise op in the dynamics step runs over B lanes instead of
        the 37-wide state dimension."""
        dt, ns = self.ocp.dt, self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params_lm.items()}
        step_lm = jax.vmap(
            lambda x, u, p: self.ocp.step(x, u, p, dt),
            in_axes=(-1, -1, -1), out_axes=-1,
        )

        def node(xhat, inp):
            Xn, Un, kn, Kn, dn, pn = inp
            u = Un + alpha * kn + lm_matvec(Kn, xhat - Xn)
            xnext = step_lm(xhat, u, pn) - (1.0 - alpha) * dn
            return xnext, (xhat, u)

        x_final, (Xs, Us) = jax.lax.scan(
            node, x0_lm, (X_lm[:ns], U_lm, ks_lm, Ks_lm, d_lm, p_stage),
            unroll=self.opts.rollout_unroll,
        )
        return jnp.concatenate([Xs, x_final[None]], axis=0), Us

    def _total_cost_lm(self, X_lm, U_lm, params_lm):
        """Lane-major batched objective: Σ‖ρ‖² per member — operands
        (ns+1, nx, B) / (ns, nu, B), returns (B,)."""
        ns = self.ocp.ns
        p_stage = {k: v[:ns] for k, v in params_lm.items()}
        rho = jax.vmap(
            jax.vmap(self._stage_rho, in_axes=(-1, -1, -1), out_axes=-1)
        )(X_lm[:ns], U_lm, p_stage)
        p_term = {k: v[ns] for k, v in params_lm.items()}
        rt = jax.vmap(
            self.ocp.terminal_residual, in_axes=(-1, -1), out_axes=-1
        )(X_lm[ns], p_term)
        return jnp.sum(rho * rho, axis=(0, 1)) + jnp.sum(rt * rt, axis=0)

    def _forward_linear(self, x0, X, U, ks, Ks, lin, params, alpha):
        """Linearized forward pass — the Gauss-Newton/SQP step:
            δx₀ = x0 − X₀
            δxₙ₊₁ = (Aₙ + BₙKₙ) δxₙ + α (Bₙkₙ + dₙ)
            ûₙ = Uₙ + α kₙ + Kₙ δxₙ
        An affine recursion, evaluated as an associative scan — zero
        sequential dependence on the horizon (unlike the nonlinear rollout).
        The true dynamics gap of the result is re-measured at the next
        linearization; used with `forward_pass="linear"`."""
        A, B, d = lin["A"], lin["B"], lin["d"]
        M = A + jnp.einsum("nxu,nuy->nxy", B, Ks)
        v = alpha * (jnp.einsum("nxu,nu->nx", B, ks) + d)

        def combine(f, g):
            """compose affine maps: g ∘ f (f earlier in the horizon)."""
            Mf, vf = f
            Mg, vg = g
            return (
                jnp.einsum("...xy,...yz->...xz", Mg, Mf),
                jnp.einsum("...xy,...y->...x", Mg, vf) + vg,
            )

        Mc, vc = jax.lax.associative_scan(combine, (M, v), axis=0)
        dx0 = x0 - X[0]
        # δx at nodes 1..ns from prefix compositions; δx₀ separately
        dX_tail = jnp.einsum("nxy,y->nx", Mc, dx0) + vc
        dX = jnp.concatenate([dx0[None], dX_tail], axis=0)
        Un = U + alpha * ks + jnp.einsum("nuy,ny->nu", Ks, dX[:-1])
        return X + dX, Un

    def _true_defects(self, X, U, params):
        ns, dt = self.ocp.ns, self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        F = jax.vmap(lambda x, u, p: self.ocp.step(x, u, p, dt))(
            X[:ns], U, p_stage
        )
        return F - X[1:]

    # ---------- one DDP iteration ----------

    def _parallel_line_search(self, state, x0, params, lin, ks, Ks,
                              dV1, dV2, nu, D, merit0):
        """Evaluate all candidate step sizes in one batched rollout and pick
        the largest accepted α — identical accept/reject rule as the
        sequential backtracking loop, but constant latency (no data-dependent
        while_loop, no stragglers across a vmapped batch)."""
        opts = self.opts
        K = opts.parallel_line_search_width
        dtype = state.X.dtype
        alphas = opts.alpha_0 * (
            opts.line_search_decrease_factor ** jnp.arange(K, dtype=dtype)
        )

        def trial(a):
            if opts.forward_pass == "linear":
                Xn, Un = self._forward_linear(
                    x0, state.X, state.U, ks, Ks, lin, params, a
                )
                dn = self._true_defects(Xn, Un, params)
                D_new = jnp.sum(dn * dn)
                new_cost = self.total_cost(Xn, Un, params)
            else:
                # rollout (sequential scan) + cost as a SEPARATE pass: the
                # cost sweep is node-parallel (vmapped); fusing it into the
                # rollout scan measured slower on TPU (serializes it)
                Xn, Un = self._rollout(
                    x0, state.X, state.U, ks, Ks, lin["d"], params, a
                )
                new_cost = self.total_cost(Xn, Un, params)
                D_new = (1.0 - a) ** 2 * D  # exact by construction
            new_merit = new_cost + nu * D_new
            expected = -(a * dV1 + a**2 * dV2) + (2.0 * a - a**2) * nu * D
            ok = (
                ((merit0 - new_merit) >= opts.beta * jnp.maximum(expected, 1e-16))
                & jnp.isfinite(new_merit)
                & (a >= opts.alpha_converge_threshold)
            )
            return Xn, Un, new_cost, new_merit, ok

        # chunked deepening (matches the batched path): width-K fans of
        # ever-smaller α until acceptance or the 1e-12 reference floor
        # (dsrbd_example.py:57) — constant latency on the warm path (one
        # fan), deep backtracking only while the model's reduction at the
        # chunk's α is resolvable above the merit's floating-point noise
        # (see the batched-path `worth` gate).
        n_chunks = -(-opts.max_line_search_steps // K)
        a0 = jnp.asarray(opts.alpha_0, dtype)
        expected0 = -(a0 * dV1 + a0**2 * dV2) + (2.0 * a0 - a0**2) * nu * D
        noise = jnp.maximum(
            32.0 * jnp.finfo(dtype).eps * jnp.maximum(merit0, 1.0),
            opts.cost_reduction_ths * jnp.maximum(merit0, 1.0),
        )

        def cond(s):
            c, _, _, _, _, found = s
            alpha_c = jnp.asarray(
                opts.line_search_decrease_factor, dtype
            ) ** (c * K).astype(dtype)
            worth = expected0 * alpha_c > noise
            return (c < n_chunks) & ~found & ((c == 0) | worth)

        def body(s):
            c, Xb, Ub, costb, meritb, _ = s
            al = alphas * (
                opts.line_search_decrease_factor ** (c * K).astype(dtype)
            )
            Xs, Us, costs, merits, oks = jax.vmap(trial)(al)
            any_ok = jnp.any(oks)
            # first accepted (largest α): argmax returns the first True
            idx = jnp.argmax(oks)
            return (
                c + 1,
                jnp.where(any_ok, Xs[idx], Xb),
                jnp.where(any_ok, Us[idx], Ub),
                jnp.where(any_ok, costs[idx], costb),
                jnp.where(any_ok, merits[idx], meritb),
                any_ok,
            )

        init = (
            jnp.asarray(0, jnp.int32), state.X, state.U,
            state.cost, merit0, jnp.asarray(False),
        )
        _, Xb, Ub, costb, meritb, found = jax.lax.while_loop(cond, body, init)
        return Xb, Ub, costb, meritb, found

    def _iteration(self, state: _IterState, x0, params):
        opts = self.opts
        lin = self._linearize(state.X, state.U, params)
        mu = jnp.asarray(opts.mu0, state.X.dtype)
        if opts.riccati_mode == "associative":
            ks, Ks, dV1, dV2 = self._backward_associative(lin, mu)
        else:
            ks, Ks, dV1, dV2 = self._backward(lin, mu)

        # Multiple-shooting merit: φ = J + ν·D with D = Σ‖defect‖². The
        # forward pass contracts every defect by exactly (1−α), so the
        # defect part of the merit after a trial step is (1−α)²·ν·D —
        # analytic, no re-evaluation needed. Without this term the raw-cost
        # Armijo can never leave an infeasible warm start (its J is
        # artificially low because the trajectory ignores the dynamics).
        nu = jnp.asarray(opts.defect_weight, state.X.dtype)
        D = jnp.sum(lin["d"] * lin["d"])
        merit0 = state.cost + nu * D

        if opts.line_search_mode == "parallel":
            Xn, Un, new_cost, new_merit, accepted = self._parallel_line_search(
                state, x0, params, lin, ks, Ks, dV1, dV2, nu, D, merit0
            )
            merit_red = merit0 - new_merit
            converged = (~accepted) | (
                merit_red <= opts.cost_reduction_ths * jnp.maximum(merit0, 1.0)
            )
            return _IterState(
                X=jnp.where(accepted, Xn, state.X),
                U=jnp.where(accepted, Un, state.U),
                cost=jnp.where(accepted, new_cost, state.cost),
                converged=converged,
                it=state.it + 1,
            )

        class LS(NamedTuple):
            alpha: jnp.ndarray
            X: jnp.ndarray
            U: jnp.ndarray
            cost: jnp.ndarray
            merit: jnp.ndarray
            accepted: jnp.ndarray
            steps: jnp.ndarray

        def ls_cond(s: LS):
            return (~s.accepted) & (s.steps < opts.max_line_search_steps) & (
                s.alpha >= opts.alpha_converge_threshold
            )

        def ls_body(s: LS):
            a = s.alpha
            Xn, Un = self._rollout(
                x0, state.X, state.U, ks, Ks, lin["d"], params, a
            )
            new_cost = self.total_cost(Xn, Un, params)
            new_merit = new_cost + nu * (1.0 - a) ** 2 * D
            # expected merit reduction: GN model for J + exact defect part
            expected = -(a * dV1 + a**2 * dV2) + (2.0 * a - a**2) * nu * D
            suff = (merit0 - new_merit) >= opts.beta * jnp.maximum(
                expected, 1e-16
            )
            ok = suff & jnp.isfinite(new_merit)
            return LS(
                alpha=jnp.where(ok, a, a * opts.line_search_decrease_factor),
                X=jnp.where(ok, Xn, s.X),
                U=jnp.where(ok, Un, s.U),
                cost=jnp.where(ok, new_cost, s.cost),
                merit=jnp.where(ok, new_merit, s.merit),
                accepted=ok,
                steps=s.steps + 1,
            )

        init = LS(
            alpha=jnp.asarray(opts.alpha_0, state.X.dtype),
            X=state.X,
            U=state.U,
            cost=state.cost,
            merit=merit0,
            accepted=jnp.asarray(False),
            steps=jnp.asarray(0, jnp.int32),
        )
        ls = jax.lax.while_loop(ls_cond, ls_body, init)

        merit_red = merit0 - ls.merit
        converged = (~ls.accepted) | (
            merit_red <= opts.cost_reduction_ths * jnp.maximum(merit0, 1.0)
        )
        return _IterState(
            X=jnp.where(ls.accepted, ls.X, state.X),
            U=jnp.where(ls.accepted, ls.U, state.U),
            cost=jnp.where(ls.accepted, ls.cost, state.cost),
            converged=converged,
            it=state.it + 1,
        )

    # ---------- public API ----------

    def init(self, x0, U0: Optional[jnp.ndarray] = None) -> DDPSolution:
        """Cold-start state: X = x0 replicated, U = 0 (or given U0) — the
        multiple-shooting initialization (all defects live on the dynamics)."""
        ns = self.ocp.ns
        U = jnp.zeros((ns, self.ocp.nu), x0.dtype) if U0 is None else U0
        X = jnp.tile(x0[None], (ns + 1, 1))
        z = jnp.zeros((), x0.dtype)
        return DDPSolution(
            X=X, U=U, cost=z, converged=jnp.asarray(False),
            iterations=jnp.asarray(0, jnp.int32), defect_norm=z,
        )

    def solve(self, sol: DDPSolution, x0, params) -> DDPSolution:
        """One full MS-DDP solve (ddp.py:96-106). Pure and jittable; vmap
        over a leading batch axis of (sol, x0, params) for scenario sweeps.

        Traced under full-f32 matmul precision: TPU matmuls default to
        bf16 inputs, which has too few mantissa bits for the 1e6-penalty
        Riccati algebra (SURVEY.md §7.4 item 1) — with bf16 the Cholesky
        factors are garbage, every line search fails, and defects never
        close. These are tiny (≤61-wide) matrices; full precision costs
        nothing measurable."""
        with jax.default_matmul_precision("highest"):
            return self._solve_impl(sol, x0, params)

    def _solve_impl(self, sol: DDPSolution, x0, params) -> DDPSolution:
        opts = self.opts
        # Pin node 0 to the commanded initial state BEFORE iterating: X₀ is
        # not a decision variable in multiple shooting, and a warm start
        # carried over from the previous tick has X₀ = the old state. With
        # the pin, the x0 gap surfaces as the node-0 defect d₀ =
        # f(x0,U₀) − X₁ and flows through the merit/defect-contraction
        # machinery like any other shooting gap. Without it, a lower-cost
        # stale plan can "win" the line search against every rollout from
        # the true x0 and be returned as converged while inconsistent with
        # the actual initial state (caught by tests/test_diff_mpc.py /
        # test_msddp.py::test_x0_gap_is_a_defect).
        X_pinned = sol.X.at[0].set(x0)
        cost0 = self.total_cost(X_pinned, sol.U, params)
        state = _IterState(
            X=X_pinned, U=sol.U, cost=cost0,
            converged=jnp.asarray(False), it=jnp.asarray(0, jnp.int32),
        )

        def cond(s: _IterState):
            return (~s.converged) & (s.it < opts.max_iters)

        def body(s: _IterState):
            return self._iteration(s, x0, params)

        final = jax.lax.while_loop(cond, body, state)

        ns = self.ocp.ns
        dt = self.ocp.dt
        p_stage = {k: v[:ns] for k, v in params.items()}
        F = jax.vmap(lambda x, u, p: self.ocp.step(x, u, p, dt))(
            final.X[:ns], final.U, p_stage
        )
        defect = jnp.max(jnp.abs(F - final.X[1:]))
        return DDPSolution(
            X=final.X, U=final.U, cost=final.cost, converged=final.converged,
            iterations=final.it, defect_norm=defect,
        )

    def solution_dict(self, sol: DDPSolution) -> Dict[str, Any]:
        """Named solution blocks — `getSolutionDict` parity (ddp.py:119-151).
        Arrays are time-major (ns+1, dim) (the reference returns dim×nodes;
        transposed here for TPU-friendly layout)."""
        out: Dict[str, Any] = dict(x_opt=sol.X, u_opt=sol.U)
        out.update(self.ocp.state_layout.unpack(sol.X))
        out.update(self.ocp.input_layout.unpack(sol.U))
        return out
