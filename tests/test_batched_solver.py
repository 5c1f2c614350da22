"""Lane-major batched solver path: solve_batch must match vmap(solve)
member-for-member, and tick_batch must match vmap(tick)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _setup(B=5):
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_srbd_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(
        prob.ocp,
        DDPOptions(max_iters=8, alpha_converge_threshold=1e-12, beta=1e-3),
    )
    key = jax.random.key(7)
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float64)
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    return cfg, prob, solver, x0, params


class TestSolveBatch:
    def test_matches_vmap(self):
        _, prob, solver, x0, params = _setup()
        sols0 = jax.vmap(solver.init)(x0)
        ref = jax.vmap(solver.solve)(sols0, x0, params)
        got = jax.jit(solver.solve_batch)(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-7, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(got.converged), np.asarray(ref.converged)
        )


class TestLaneMajorRollout:
    """opts.rollout_lane_major: the α₀ trial's rollout/cost evaluated
    lane-major must reproduce the batch-first path (measured a wash on
    TPU — kept as a validated knob; see config.py)."""

    def test_matches_batch_first(self):
        _, prob, solver, x0, params = _setup()
        import dataclasses

        lm = MSDDP(
            prob.ocp,
            dataclasses.replace(solver.opts, rollout_lane_major=True),
        )
        sols0 = jax.vmap(solver.init)(x0)
        ref = jax.jit(solver.solve_batch)(sols0, x0, params)
        got = jax.jit(lm.solve_batch)(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-7, atol=1e-8
        )
        assert bool(jnp.all(got.iterations == ref.iterations))


class TestActiveCompaction:
    """opts.active_compact_levels: iterations executed on a compacted
    active sub-batch must match the full-batch path to f64 rounding
    (per-member arithmetic is lane-position independent; the nested
    lax.cond dispatch changes XLA codegen so bit-identity does NOT
    hold), with iteration counts and convergence flags exactly equal.
    Levels below 32 lanes are skipped, so the batch must be ≥64 for any
    level to engage at all — asserted via solver.compaction_levels."""

    def test_rounding_equivalent_and_engaged(self):
        import dataclasses

        ocp = _atan_ocp()
        B = 64
        # 48 members start near the optimum (converge in 1-2 iterations),
        # 16 start far out (GN overshoots → backtracking, many iterations)
        # ⇒ the active count drops to ≤B/2=32 early and the compacted
        # branch executes for the remaining iterations.
        near = 0.05 * jnp.cos(jnp.arange(48.0))[:, None]
        far = (4.0 + jnp.arange(16.0))[:, None]
        x0 = jnp.concatenate([near, far]).astype(jnp.float64)
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), ocp.params
        )
        opts = DDPOptions(
            max_iters=12, alpha_converge_threshold=1e-12, beta=1e-3
        )
        base = MSDDP(ocp, opts)
        comp = MSDDP(ocp, dataclasses.replace(opts, active_compact_levels=1))
        assert comp.compaction_levels(B) == [32], "level must engage at B=64"
        sols = jax.vmap(base.init)(x0)
        ref = jax.jit(base.solve_batch)(sols, x0, params)
        got = jax.jit(comp.solve_batch)(sols, x0, params)
        # the scenario must actually exercise compaction: members converge
        # at spread-out iterations and the slowest needs > 1 iteration
        assert int(jnp.max(ref.iterations)) > int(jnp.min(ref.iterations))
        assert int(jnp.max(ref.iterations)) >= 3
        np.testing.assert_array_equal(
            np.asarray(got.iterations), np.asarray(ref.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(got.converged), np.asarray(ref.converged)
        )
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-13, atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-13, atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-12
        )

    def test_sub32_levels_skipped(self):
        """At B=16 no level clears the 32-lane floor — compaction must be
        a declared no-op (guards against silently-vacuous configs)."""
        import dataclasses

        ocp = _atan_ocp()
        comp = MSDDP(
            ocp,
            dataclasses.replace(DDPOptions(), active_compact_levels=2),
        )
        assert comp.compaction_levels(16) == []
        assert comp.compaction_levels(64) == [32]
        assert comp.compaction_levels(256) == [128, 64]


class TestTickBatch:
    def test_matches_vmap_tick(self):
        cfg, prob, solver, x0, params = _setup(B=4)
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
        loop = MPCLoop(
            solver=solver, wpg=wpg, srbd_constants=prob.ocp.constants
        )
        carries = jax.vmap(loop.init)(x0)
        inp = TickInput(
            action=jnp.array([0, 1, 1, 2], jnp.int32),
            rdot_ref=jnp.tile(jnp.array([0.2, 0.0, 0.0])[None], (4, 1)),
            w_ref=jnp.zeros((4, 3)),
        )
        # jit both paths once — the eager (op-by-op) ticks made this the
        # second-slowest test in the suite at identical coverage
        vtick = jax.jit(jax.vmap(loop.tick))
        btick = jax.jit(loop.tick_batch)
        c_ref, o_ref = vtick(carries, inp)
        c_got, o_got = btick(carries, inp)
        np.testing.assert_allclose(
            np.asarray(o_got.x), np.asarray(o_ref.x), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(c_got.params["c_ref"]),
            np.asarray(c_ref.params["c_ref"]), atol=1e-12,
        )
        # multi-tick consistency
        for _ in range(3):
            c_ref, o_ref = vtick(c_ref, inp)
            c_got, o_got = btick(c_got, inp)
        np.testing.assert_allclose(
            np.asarray(o_got.x), np.asarray(o_ref.x), rtol=1e-6, atol=1e-7
        )


def _atan_ocp(ns=6, dt=0.2):
    """Minimal OCP whose Gauss-Newton step genuinely OVERSHOOTS: the
    residual atan(z) has |GN step| = |atan(z)|(1+z²) ≫ |z| away from the
    origin, so members starting far out reject α₀ and must backtrack —
    a deterministic fan-engagement scenario (the SRBD GN step is too good:
    even a 3 m/s push is fixed in one accepted full step)."""
    from srbd_horizon_tpu.ocp.layout import VarLayout
    from srbd_horizon_tpu.ocp.spec import OCP

    def xdot(x, u, p):
        del p
        return u

    def step(x, u, p, dt_):
        return x + dt_ * xdot(x, u, p)

    def stage_residual(x, u, p):
        del p
        # input cost must be ~free: with a real regularizer the LQR step
        # is tame and even a far-out member accepts α₀ (no overshoot)
        return jnp.concatenate([jnp.arctan(x), 0.002 * u])

    def terminal_residual(x, p):
        del p
        return jnp.arctan(x)

    return OCP(
        ns=ns, dt=dt,
        state_layout=VarLayout([("z", 1)]),
        input_layout=VarLayout([("u", 1)]),
        step=step, xdot=xdot,
        stage_residual=stage_residual, terminal_residual=terminal_residual,
        params={"dummy": jnp.zeros((ns + 1, 1), jnp.float64)},
    )


class TestSlicedLinearize:
    """linearize_sliced: split-argnum jacfwd emitting only the declared
    live Jacobian rows must reproduce the dense path's solve exactly (each
    one-hot tangent runs the same arithmetic; rows outside the declared
    sets are identically zero — the blocksparse backward's contract)."""

    def test_matches_dense_on_srbd(self):
        import dataclasses

        _, prob, base, x0, params = _setup()
        solver = MSDDP(
            prob.ocp,
            dataclasses.replace(base.opts, linearize_sliced=False),
        )
        sli = MSDDP(
            prob.ocp,
            dataclasses.replace(base.opts, linearize_sliced=True),
        )
        sols0 = jax.vmap(solver.init)(x0)
        dense = jax.jit(solver.solve_batch)(sols0, x0, params)
        got = jax.jit(sli.solve_batch)(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(dense.X), rtol=1e-12, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(dense.U), rtol=1e-12, atol=1e-13
        )
        np.testing.assert_array_equal(
            np.asarray(got.iterations), np.asarray(dense.iterations)
        )

    def test_lane_out_matches(self):
        """linearize_lane_out emits the sliced stacks lane-major straight
        out of the vmap; pure layout change — the solve must be
        bit-identical to the batch-first sliced emission."""
        import dataclasses

        _, prob, base, x0, params = _setup()
        sli = MSDDP(
            prob.ocp,
            dataclasses.replace(base.opts, linearize_sliced=True),
        )
        lane = MSDDP(
            prob.ocp,
            dataclasses.replace(
                base.opts, linearize_sliced=True, linearize_lane_out=True
            ),
        )
        sols0 = jax.vmap(sli.init)(x0)
        ref = jax.jit(sli.solve_batch)(sols0, x0, params)
        got = jax.jit(lane.solve_batch)(sols0, x0, params)
        np.testing.assert_array_equal(np.asarray(got.X), np.asarray(ref.X))
        np.testing.assert_array_equal(np.asarray(got.U), np.asarray(ref.U))
        np.testing.assert_array_equal(
            np.asarray(got.iterations), np.asarray(ref.iterations)
        )

    def test_fused_backward_matches(self):
        """linearize_fused_backward forms the stage Jacobians inside the
        backward scan; same one-hot-tangent arithmetic, but XLA fuses the
        in-scan formation differently, so equality holds to rounding
        (measured 3e-16 abs on CPU f64), not bit-for-bit."""
        import dataclasses

        _, prob, base, x0, params = _setup()
        sli = MSDDP(
            prob.ocp,
            dataclasses.replace(base.opts, linearize_sliced=True),
        )
        fus = MSDDP(
            prob.ocp,
            dataclasses.replace(
                base.opts, linearize_sliced=True,
                linearize_fused_backward=True,
            ),
        )
        sols0 = jax.vmap(sli.init)(x0)
        ref = jax.jit(sli.solve_batch)(sols0, x0, params)
        got = jax.jit(fus.solve_batch)(sols0, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-9, atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(got.iterations), np.asarray(ref.iterations)
        )


class TestFanCompaction:
    """line_search_compact: with only a few members rejecting α₀, the
    deepening fan gathers just those members, backtracks on the compacted
    sub-batch, and scatters the accepted steps back."""

    def _fleet(self):
        ocp = _atan_ocp()
        opts = DDPOptions(max_iters=12, alpha_converge_threshold=1e-12,
                          beta=1e-3)
        # member 2 starts far out (GN overshoots, must backtrack); the
        # rest start near the optimum (fast path)
        x0 = jnp.array([[0.05], [0.1], [8.0], [0.02], [-0.1], [0.08]])
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (6,) + (1,) * a.ndim), ocp.params
        )
        return ocp, opts, x0, params

    def test_fan_engages_for_a_strict_subset(self):
        """White-box probe of the first iteration: exactly the far-out
        member rejects α₀ with an above-noise predicted reduction — the
        precondition for the compact branch to run inside solve_batch."""
        from srbd_horizon_tpu.solvers.msddp import _IterState

        ocp, opts, x0, params = self._fleet()
        solver = MSDDP(ocp, opts)
        with jax.default_matmul_precision("highest"):
            sols = jax.vmap(solver.init)(x0)
            st = _IterState(
                X=sols.X, U=sols.U,
                cost=jax.vmap(solver.total_cost)(sols.X, sols.U, params),
                converged=jnp.zeros((6,), bool),
                it=jnp.zeros((6,), jnp.int32),
            )
            lin = jax.vmap(solver._linearize)(st.X, st.U, params)
            ks, Ks, dV1, dV2 = solver._backward_lanemajor(
                lin, jnp.asarray(opts.mu0, jnp.float64)
            )
            nu_w = jnp.asarray(opts.defect_weight, jnp.float64)
            D = jnp.sum(lin["d"] * lin["d"], axis=(1, 2))
            merit0 = st.cost + nu_w * D
            Xn, Un = jax.vmap(
                lambda a, b, c, d, e, f, g: solver._rollout(
                    a, b, c, d, e, f, g, jnp.asarray(1.0, jnp.float64)
                )
            )(x0, st.X, st.U, ks, Ks, lin["d"], params)
            new_merit = jax.vmap(solver.total_cost)(Xn, Un, params)
            expected0 = -(dV1 + dV2) + nu_w * D
            ok1 = (merit0 - new_merit) >= opts.beta * jnp.maximum(
                expected0, 1e-16
            )
            noise = jnp.maximum(
                32.0 * jnp.finfo(jnp.float64).eps * jnp.maximum(merit0, 1.0),
                opts.cost_reduction_ths * jnp.maximum(merit0, 1.0),
            )
            need = np.asarray(~ok1 & (expected0 > noise))
        assert need[2], "far-out member must reject the full GN step"
        assert need.sum() < 6, "fast-path members must accept α₀"

    def test_compacted_fan_matches_full_fan_and_vmap(self):
        import dataclasses

        ocp, opts, x0, params = self._fleet()
        full = MSDDP(ocp, dataclasses.replace(opts, line_search_compact=0))
        comp = MSDDP(ocp, dataclasses.replace(opts, line_search_compact=2))
        sols = jax.vmap(full.init)(x0)

        out_f = jax.jit(full.solve_batch)(sols, x0, params)
        out_c = jax.jit(comp.solve_batch)(sols, x0, params)
        ref = jax.vmap(comp.solve)(sols, x0, params)

        # every member converged near the origin (the far-out one REQUIRED
        # backtracking to get there — see the probe test)
        assert np.abs(np.asarray(out_c.X[:, -1, 0])).max() < 0.2
        np.testing.assert_allclose(
            np.asarray(out_c.X), np.asarray(out_f.X), rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(out_c.X), np.asarray(ref.X), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_array_equal(
            np.asarray(out_c.converged), np.asarray(out_f.converged)
        )
        # fast-path members are BIT-identical between compact and full fan
        # (the compacted fan cannot perturb members it did not gather)
        for i in (0, 1, 3, 4, 5):
            np.testing.assert_array_equal(
                np.asarray(out_c.X[i]), np.asarray(out_f.X[i])
            )


class TestDynamicsColumnSparsity:
    """ocp.dynamics_u_cols (isrbd: 12 of 30 B columns are dead — forces
    never enter the double-integrator dynamics): the column-sparse
    B-chain contractions + static scatters must reproduce the dense-column
    path exactly across every blocksparse input variant."""

    def _setup(self, B=4):
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem

        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_isrbd_problem(cfg, kangaroo_line_feet())
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0.at[:, 0].add(jnp.linspace(-0.02, 0.02, B))
        x0 = x0.at[:, 19].add(jnp.linspace(0.0, 0.2, B))  # push rdot_x
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        opts = dict(
            max_iters=6, alpha_converge_threshold=1e-12, beta=1e-3,
            linearize_sliced=True, backward_contract="blocksparse",
        )
        return prob, x0, params, opts

    def _run(self, ocp, x0, params, opts):
        s = MSDDP(ocp, DDPOptions(**opts))
        sols = jax.vmap(s.init)(x0)
        return s.solve_batch(sols, x0, params)

    def test_col_sparse_matches_dense_cols(self):
        import dataclasses

        prob, x0, params, base = self._setup()
        assert prob.ocp.dynamics_u_cols is not None
        ocp_dense = dataclasses.replace(prob.ocp, dynamics_u_cols=None)
        for overrides in (
            {},                                    # sliced linearize
            {"linearize_fused_backward": True},    # in-scan formation
            {"linearize_lane_out": True},          # lane-major emission
            {"linearize_sliced": False},           # dense-input blocksparse
        ):
            opts = {**base, **overrides}
            got = self._run(prob.ocp, x0, params, opts)
            ref = self._run(ocp_dense, x0, params, opts)
            np.testing.assert_allclose(
                np.asarray(got.X), np.asarray(ref.X), rtol=1e-9, atol=1e-12,
                err_msg=str(overrides),
            )
            np.testing.assert_allclose(
                np.asarray(got.U), np.asarray(ref.U), rtol=1e-9, atol=1e-12,
                err_msg=str(overrides),
            )
            np.testing.assert_allclose(
                np.asarray(got.cost), np.asarray(ref.cost), rtol=1e-12,
                err_msg=str(overrides),
            )
            np.testing.assert_array_equal(
                np.asarray(got.iterations), np.asarray(ref.iterations),
                err_msg=str(overrides),
            )


class TestPairNodesBackward:
    """opts.backward_pair_nodes (round-4 carry-chain experiment): the
    two-node-fused Riccati scan is the same arithmetic regrouped, so the
    batched solve must match the single-node scan to rounding (XLA fuses
    the paired bodies differently — not bit-identical; line-search
    decisions can flip at rounding level, so iterations may differ by
    ±1 while converged solutions coincide)."""

    def test_matches_single_node_scan(self):
        import dataclasses

        ocp = _atan_ocp(ns=6)
        opts = DDPOptions(max_iters=20, alpha_converge_threshold=1e-12,
                          beta=1e-3)
        base = MSDDP(ocp, opts)
        pair = MSDDP(ocp, dataclasses.replace(opts, backward_pair_nodes=True))
        x0 = jnp.array([[0.05], [0.4], [2.0], [-0.8]])
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (4,) + (1,) * a.ndim), ocp.params
        )
        sols = jax.vmap(base.init)(x0)
        r1 = jax.jit(base.solve_batch)(sols, x0, params)
        r2 = jax.jit(pair.solve_batch)(sols, x0, params)
        np.testing.assert_allclose(
            np.asarray(r2.X), np.asarray(r1.X), rtol=1e-8, atol=1e-10
        )
        np.testing.assert_array_equal(
            np.asarray(r2.converged), np.asarray(r1.converged)
        )

    def test_odd_ns_falls_back(self):
        import dataclasses

        ocp = _atan_ocp(ns=5)
        pair = MSDDP(
            ocp,
            dataclasses.replace(DDPOptions(max_iters=10),
                                backward_pair_nodes=True),
        )
        x0 = jnp.array([[0.3], [1.0]])
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (2,) + (1,) * a.ndim), ocp.params
        )
        sols = jax.vmap(pair.init)(x0)
        out = jax.jit(pair.solve_batch)(sols, x0, params)
        assert bool(jnp.all(jnp.isfinite(out.X)))
