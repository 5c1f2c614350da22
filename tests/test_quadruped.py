"""Quadruped morphology: a second robot family through the same stack —
constants provenance (URDF round-trip through both extractors), trot WPG
group masking, and closed-loop trot stability.

The reference is biped-only; contact_model=1 × number_of_legs=4 is the
other corner its config surface provisions (reference prb.py:39-41,
launch:16-17). See models/quadruped.py."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.quadruped import (
    QUADRUPED_FOOT_FRAMES,
    QUADRUPED_JOINT_INIT,
    QUADRUPED_URDF,
    QUADRUPED_WORLD_FRAME,
    quadruped_from_urdf,
    quadruped_point_feet,
    trot_group_mask,
)
from srbd_horizon_tpu.models.urdf import run_native_tool
from srbd_horizon_tpu.problems.srbd import build_srbd_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, walking_schedule
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import STEP, WalkingPatternGenerator

TOOL_DIR = Path(__file__).resolve().parents[1] / "tools" / "urdf_constants"


class TestQuadrupedConstants:
    def test_recorded_matches_extraction(self):
        """models/quadruped.py constants regenerate from the committed
        asset — hand edits to either side fail here."""
        rec = quadruped_point_feet()
        ext = quadruped_from_urdf()
        assert ext.mass == rec.mass
        np.testing.assert_allclose(ext.com, rec.com, atol=1e-12)
        np.testing.assert_allclose(ext.inertia, rec.inertia, atol=1e-9)
        np.testing.assert_allclose(
            ext.foot_positions, rec.foot_positions, atol=1e-12
        )
        assert ext.foot_frames == rec.foot_frames

    def test_geometry(self):
        """Stance rectangle: 0.60 m wheelbase × 0.34 m track, feet on the
        world plane, CoM centered over the support polygon."""
        c = quadruped_point_feet()
        np.testing.assert_allclose(c.foot_positions[:, 2], 0.0, atol=1e-12)
        np.testing.assert_allclose(
            c.foot_positions[0] - c.foot_positions[2], [0.60, 0, 0],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            c.foot_positions[0] - c.foot_positions[1], [0, 0.34, 0],
            atol=1e-12,
        )
        np.testing.assert_allclose(
            c.com[:2], c.foot_positions[:, :2].mean(axis=0), atol=1e-12
        )

    @pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
    def test_native_extraction_matches_recorded(self):
        subprocess.run(["make", "-s"], cwd=TOOL_DIR, check=True)
        rec = quadruped_point_feet()
        cc = run_native_tool(
            QUADRUPED_URDF, list(QUADRUPED_JOINT_INIT),
            list(QUADRUPED_FOOT_FRAMES), QUADRUPED_WORLD_FRAME,
        )
        assert np.isclose(cc["mass"], rec.mass)
        np.testing.assert_allclose(
            np.array(cc["inertia"]), rec.inertia, atol=1e-9
        )
        feet = np.stack([cc["frames"][f] for f in QUADRUPED_FOOT_FRAMES])
        np.testing.assert_allclose(feet, rec.foot_positions, atol=1e-9)


class TestTrotWPG:
    def test_diagonal_pairs_alternate(self):
        """With the trot mask, lf+rh follow the A-cycle and rf+lh the
        B-cycle: during A's swing window the A contacts have
        cdot_switch=0 (swing) while B's are 1 (stance), and vice versa
        half a cycle later."""
        cfg = SRBDConfig(contact_model=1, number_of_legs=4,
                         dtype=jnp.float64)
        prob = build_srbd_problem(cfg, quadruped_point_feet())
        wpg = WalkingPatternGenerator.build(
            0.0, cfg.ns, contact_model=1, number_of_legs=4,
            dtype=jnp.float64, group_mask=trot_group_mask(),
        )
        params = dict(prob.ocp.params)
        state = wpg.init_state()
        terminal_switch = []
        for _ in range(2 * wpg.step_nodes):
            params, state = wpg.advance(params, state, STEP)
            terminal_switch.append(np.asarray(params["cdot_switch"][-1]))
        sw = np.stack(terminal_switch)  # (2*step_nodes, nc)
        # A-group entries (lf=0, rh=3) are identical; B-group (rf=1, lh=2)
        # identical; the groups swing in opposite half-cycles
        np.testing.assert_array_equal(sw[:, 0], sw[:, 3])
        np.testing.assert_array_equal(sw[:, 1], sw[:, 2])
        a_swings = np.where(sw[:, 0] == 0.0)[0]
        b_swings = np.where(sw[:, 1] == 0.0)[0]
        assert len(a_swings) > 0 and len(b_swings) > 0
        assert set(a_swings).isdisjoint(b_swings)

    def test_biped_default_unchanged(self):
        """group_mask=None reproduces the reference biped split."""
        wpg_default = WalkingPatternGenerator.build(0.0, 20)
        assert wpg_default.group_mask is None


class TestClosedLoopTrot:
    def test_stable_trot(self):
        """120-tick closed-loop trot at vx=0.25: finite, CoM height in a
        tight band, forward progress, defects at solver tolerance —
        the dsrbd walk test's criteria on the new morphology."""
        dtype = jnp.float64
        cfg = SRBDConfig(contact_model=1, number_of_legs=4, dtype=dtype)
        prob = build_srbd_problem(cfg, quadruped_point_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=5, alpha_converge_threshold=1e-12,
                       beta=1e-3),
        )
        wpg = WalkingPatternGenerator.build(
            0.0, cfg.ns, contact_model=1, number_of_legs=4, dtype=dtype,
            group_mask=trot_group_mask(),
        )
        loop = MPCLoop(solver=solver, wpg=wpg,
                       srbd_constants=prob.ocp.constants)
        carry = loop.init(prob.initial_state)
        sched = walking_schedule(120, vx=0.25, start=10, dtype=dtype)
        carry, out = jax.jit(loop.run)(carry, sched)
        X = np.asarray(out.x)
        z0 = float(prob.initial_state[2])
        assert np.all(np.isfinite(X))
        assert np.all(np.abs(X[:, 2] - z0) < 0.05), "CoM height left band"
        assert X[-1, 0] - X[0, 0] > 0.5, "no forward progress"
        assert float(np.max(np.asarray(out.defect_norm))) < 1e-5
        assert float(np.max(np.abs(np.asarray(out.srbd_residual)))) < 1e-6


class TestQuadrupedBatchedPath:
    def test_solve_batch_matches_vmap(self):
        """The production batched path (sliced linearize + blocksparse
        backward + active compaction) must agree with vmap(solve) on the
        quadruped topology — the sparsity metadata is nc/cm-dependent and
        only the biped exercised it before."""
        dtype = jnp.float64
        cfg = SRBDConfig(contact_model=1, number_of_legs=4, dtype=dtype)
        prob = build_srbd_problem(cfg, quadruped_point_feet())
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=6))
        B = 6
        key = jax.random.key(2)
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0 + 0.02 * jax.random.normal(key, x0.shape, dtype)
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        sols = jax.vmap(solver.init)(x0)
        ref = jax.vmap(solver.solve)(sols, x0, params)
        got = jax.jit(solver.solve_batch)(sols, x0, params)
        np.testing.assert_allclose(
            np.asarray(got.X), np.asarray(ref.X), rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(got.U), np.asarray(ref.U), rtol=1e-7, atol=1e-8
        )
        # the sparsity metadata must actually be declared for this
        # topology (otherwise the test silently runs the dense path)
        assert prob.ocp.dynamics_x_rows is not None
        assert prob.ocp.residual_x_rows is not None


class TestConstrainedTrot:
    """The constrained (AL/isrbd) path on the second morphology (VERDICT
    r3 item 4): friction cones, force boxes, hybrid SRBD/LIP schedule and
    LIP-zone consistency on the quadruped topology (contact_model=1,
    number_of_legs=4), end-to-end through the online trot. The LIP
    pendulum height must match the quadruped's CoM height (the builder
    guards the mismatch)."""

    def _build(self, dtype=jnp.float32):
        from srbd_horizon_tpu.models.quadruped import trot_group_mask
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
        from srbd_horizon_tpu.solvers.alddp import ALDDP
        from srbd_horizon_tpu.solvers.options import al_serving_options

        robot = quadruped_point_feet()
        cfg = SRBDConfig(
            contact_model=1, number_of_legs=4, dtype=dtype,
            lip_height=float(robot.com[2]),
        )
        prob = build_isrbd_problem(cfg, robot)
        ddp_off, al_off = al_serving_options(max_iters=15)
        offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
        ddp_on, al_on = al_serving_options(max_iters=5)
        online = ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)
        return cfg, prob, offline, online, trot_group_mask()

    def test_lip_height_mismatch_guarded(self):
        from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
        import pytest

        cfg = SRBDConfig(contact_model=1, number_of_legs=4,
                         dtype=jnp.float32)  # biped default lip_height
        with pytest.raises(ValueError, match="lip_height"):
            build_isrbd_problem(cfg, quadruped_point_feet())

    def test_constrained_trot_feasible(self):
        from srbd_horizon_tpu.wpg import WalkingPatternGenerator

        dtype = jnp.float32
        cfg, prob, offline, online, mask = self._build(dtype)
        x0 = prob.initial_state
        U0 = jnp.tile(prob.static_input[None], (prob.ocp.ns, 1))
        st = jax.jit(offline.solve)(
            offline.init(x0, U0=U0), x0, prob.ocp.params
        )
        assert float(st.viol) < 1e-3, float(st.viol)
        wpg = WalkingPatternGenerator.build(
            0.0, prob.ocp.ns, contact_model=1, number_of_legs=4,
            dtype=dtype, group_mask=mask,
        )
        params = dict(prob.ocp.params)
        state = wpg.init_state()
        tick = jax.jit(lambda st, x0, p: online.solve_online(
            online.shift_warmstart(st), x0, p))
        adv = jax.jit(wpg.advance)
        viols = []
        for _ in range(40):
            params, state = adv(params, state, jnp.asarray(1, jnp.int32))
            params["rdot_ref"] = params["rdot_ref"].at[1:].set(
                jnp.array([0.15, 0.0, 0.0], dtype)
            )
            st = tick(st, st.sol.X[1], params)
            viols.append(float(st.viol))
        steady = np.asarray(viols[20:])
        assert bool(jnp.all(jnp.isfinite(st.sol.X)))
        # same violation envelope as the biped serving path (measured
        # 1.7e-3..5.9e-3 over the trot cycle, spikes at the touchdown
        # discontinuity of the reference's linspace-50 swing profile)
        assert steady.max() < 1e-2, steady.max()
        # the trot actually moves: CoM advanced over 40 ticks at 0.15 m/s
        assert float(st.sol.X[0, 0] - prob.initial_state[0]) > 0.15
        # cones respected on the plan
        from srbd_horizon_tpu.problems.srbd import (
            linearized_friction_cone_rows,
        )
        A = linearized_friction_cone_rows(cfg.friction_cone_coefficient)
        d = online.solution_dict(st)
        for i in range(4):
            F = np.asarray(d[f"f{i}"])
            assert (F @ A.T).max() < 2.0, i   # newtons (raw force rows)
            assert F[:, 2].min() > -2.0
