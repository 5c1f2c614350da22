"""Health monitoring and checkpoint/resume tests (capabilities beyond the
reference — SURVEY.md §5.3-5.4 note the reference has none)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.runtime.checkpoint import load_carry, save_carry
from srbd_horizon_tpu.runtime.health import HealthMonitor
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickOutput, standing_schedule
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _make_loop():
    cfg = SRBDConfig(dtype=jnp.float64)
    prob = build_lip_problem(cfg, kangaroo_line_feet())
    solver = MSDDP(prob.ocp, DDPOptions(max_iters=15))
    wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
    return prob, MPCLoop(solver=solver, wpg=wpg)


class TestHealth:
    def test_classification(self):
        mon = HealthMonitor(max_defect=1e-3)
        good = TickOutput(
            x=jnp.zeros(30), u0=jnp.zeros(15), cost=jnp.asarray(1.0),
            iterations=jnp.asarray(3), converged=jnp.asarray(True),
            defect_norm=jnp.asarray(1e-6), srbd_residual=jnp.zeros(6),
        )
        rep = mon.check(good)
        assert bool(rep.healthy)
        bad = good._replace(x=good.x.at[0].set(jnp.nan))
        assert not bool(mon.check(bad).healthy)
        drift = good._replace(defect_norm=jnp.asarray(1.0))
        assert not bool(mon.check(drift).healthy)

    def test_batched_reset(self):
        prob, loop = _make_loop()
        B = 4
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        carry = jax.vmap(loop.init)(x0)
        # corrupt member 2
        carry = carry._replace(
            x=carry.x.at[2].set(jnp.nan),
            sol=carry.sol._replace(X=carry.sol.X.at[2].set(jnp.nan)),
        )
        out = TickOutput(
            x=carry.x, u0=jnp.zeros((B, 15)), cost=jnp.ones(B),
            iterations=jnp.ones(B, jnp.int32), converged=jnp.ones(B, bool),
            defect_norm=jnp.full(B, 1e-8),
            srbd_residual=jnp.zeros((B, 6)),
        )
        mon = HealthMonitor()
        rep = mon.check(out)
        assert list(np.asarray(rep.healthy)) == [True, True, False, True]
        carry2 = mon.reset_where_unhealthy(carry, rep, prob.initial_state)
        assert bool(jnp.all(jnp.isfinite(carry2.x)))
        assert bool(jnp.all(jnp.isfinite(carry2.sol.X)))
        # healthy members untouched
        np.testing.assert_array_equal(
            np.asarray(carry2.x[0]), np.asarray(carry.x[0])
        )
        # the reset member resumes from the safe state
        np.testing.assert_array_equal(
            np.asarray(carry2.x[2]), np.asarray(prob.initial_state)
        )


class TestCheckpoint:
    def test_roundtrip_resume(self, tmp_path):
        prob, loop = _make_loop()
        carry = loop.init(prob.initial_state)
        sched = standing_schedule(10, jnp.float64)
        run = jax.jit(loop.run)
        carry_mid, _ = run(carry, jax.tree.map(lambda a: a[:5], sched))

        path = str(tmp_path / "ckpt")
        save_carry(path, carry_mid)
        template = loop.init(prob.initial_state)
        restored = load_carry(path, template)

        # resumed run must match the uninterrupted one exactly
        tail = jax.tree.map(lambda a: a[5:], sched)
        c_a, out_a = run(carry_mid, tail)
        c_b, out_b = run(restored, tail)
        np.testing.assert_allclose(
            np.asarray(out_a.x), np.asarray(out_b.x), atol=0.0
        )
        np.testing.assert_array_equal(
            np.asarray(c_a.wpg_state.step_counter),
            np.asarray(c_b.wpg_state.step_counter),
        )

    def test_structural_mismatch_raises(self, tmp_path):
        """A checkpoint written for a different pytree STRUCTURE must
        refuse to restore — even when the leaf count matches (swapped
        same-shape fields restore silently wrong otherwise). The saved
        treedef is the source of truth, not the caller's template."""
        import pytest

        from srbd_horizon_tpu.runtime.checkpoint import (
            load_pytree, save_pytree,
        )

        tree = {"a": jnp.zeros((3,)), "b": jnp.ones((3,))}
        path = str(tmp_path / "ck")
        save_pytree(path, tree)

        # same leaf count + shapes, different structure (key names)
        wrong_keys = {"a": jnp.zeros((3,)), "c": jnp.ones((3,))}
        with pytest.raises(ValueError, match="treedef"):
            load_pytree(path, wrong_keys)

        # same structure, wrong leaf shape (e.g. batch-size mismatch)
        wrong_shape = {"a": jnp.zeros((4,)), "b": jnp.ones((3,))}
        with pytest.raises(ValueError, match="shape"):
            load_pytree(path, wrong_shape)

        # wrong leaf count (treedef check fires first)
        extra = {"a": jnp.zeros((3,)), "b": jnp.ones((3,)),
                 "c": jnp.ones((2,))}
        with pytest.raises(ValueError, match="treedef"):
            load_pytree(path, extra)

        # legacy checkpoint without a .tree.json: leaf-count check holds
        import pathlib

        pathlib.Path(path).with_suffix(".tree.json").unlink()
        with pytest.raises(ValueError, match="leaves"):
            load_pytree(path, extra)

        # the matching template still round-trips
        ok = load_pytree(path, jax.tree.map(jnp.zeros_like, tree))
        np.testing.assert_array_equal(np.asarray(ok["b"]), np.ones(3))


class TestSoakTool:
    def test_soak_smoke(self):
        """tools/soak.py: the sustained-serving soak's health gates pass
        on a small CPU fleet and its JSON is well-formed (the TPU run is
        recorded in BENCH_NOTES.md round 3: 1000 ticks at B=512, ok)."""
        import json
        import subprocess
        import sys
        from pathlib import Path

        root = Path(__file__).resolve().parents[1]
        out = subprocess.run(
            [sys.executable, "tools/soak.py", "6", "30", "--cpu"],
            capture_output=True, text=True, timeout=600, cwd=root,
        )
        assert out.returncode == 0, out.stderr[-800:]
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["ok"] is True
        assert rec["solves"] == 180
        assert rec["max_defect"] < 1e-4


class TestCartesianReferences:
    """make_references must carry the reference's provisioned velocity
    channels (cartesio.py:29-37: setLinearVelocity/setAngularVelocity per
    link) alongside positions — rdot on com, w on base_link, the pair's
    first cdot on each foot (cartesio.py:74)."""

    def _solution(self, nodes=3):
        rng = np.random.default_rng(3)
        sol = {
            "r": rng.normal(size=(nodes, 3)),
            "rdot": rng.normal(size=(nodes, 3)),
            "o": rng.normal(size=(nodes, 4)),
            "w": rng.normal(size=(nodes, 3)),
        }
        for i in range(4):
            sol[f"c{i}"] = rng.normal(size=(nodes, 3))
            sol[f"cdot{i}"] = rng.normal(size=(nodes, 3))
        return sol

    def test_velocity_channels(self):
        from srbd_horizon_tpu.io.cartesio import CartesianReferenceFormatter

        sol = self._solution()
        ci = CartesianReferenceFormatter(
            ["left_sole_link", "right_sole_link"], contact_model=2
        )
        refs = ci.make_references(sol, node=1)
        np.testing.assert_allclose(refs["com"]["position"], sol["r"][1])
        np.testing.assert_allclose(
            refs["com"]["linear_velocity"], sol["rdot"][1]
        )
        np.testing.assert_allclose(
            refs["base_link"]["orientation"], sol["o"][1]
        )
        np.testing.assert_allclose(
            refs["base_link"]["angular_velocity"], sol["w"][1]
        )
        # line-feet midpoint position + FIRST-contact velocity per foot
        np.testing.assert_allclose(
            refs["left_sole_link"]["position"],
            (sol["c0"][1] + sol["c1"][1]) / 2,
        )
        np.testing.assert_allclose(
            refs["left_sole_link"]["linear_velocity"], sol["cdot0"][1]
        )
        np.testing.assert_allclose(
            refs["right_sole_link"]["position"],
            (sol["c2"][1] + sol["c3"][1]) / 2,
        )
        np.testing.assert_allclose(
            refs["right_sole_link"]["linear_velocity"], sol["cdot2"][1]
        )

    def test_lip_defaults(self):
        """LIP solutions have no orientation/angular-velocity states —
        channels default to identity quat / zero twist (the reference's
        zero-initialized TwistStamped, cartesio.py:16)."""
        from srbd_horizon_tpu.io.cartesio import CartesianReferenceFormatter

        sol = self._solution()
        del sol["o"], sol["w"]
        ci = CartesianReferenceFormatter(
            ["left_sole_link", "right_sole_link"], contact_model=2
        )
        refs = ci.make_references(sol, node=1)
        assert refs["base_link"]["orientation"] == [0, 0, 0, 1.0]
        assert refs["base_link"]["angular_velocity"] == [0.0, 0.0, 0.0]
        np.testing.assert_allclose(
            refs["com"]["linear_velocity"], sol["rdot"][1]
        )
