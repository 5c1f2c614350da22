"""WPG scheduler semantics vs a NumPy behavior oracle, and the first
end-to-end milestone: closed-loop LIP walking stays stable
(SURVEY.md §7.3 minimum slice)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.runtime.loop import (
    MPCLoop,
    TickInput,
    standing_schedule,
    walking_schedule,
)
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import (
    ACTION_CODES,
    WalkingPatternGenerator,
    shift_reference_params,
)


class WPGOracle:
    """Plain-NumPy transcription of the reference steps_phase semantics
    (wpg.py:3-101) operating on (ns+1,·) arrays."""

    def __init__(self, c_init_z, nodes, contact_model=2, number_of_legs=2):
        self.nodes = nodes
        self.cm = contact_model
        self.nc = contact_model * number_of_legs
        step_nodes = 10
        ss, ds = 8, 2
        sin = 0.1 * np.sin(np.linspace(0, np.pi, 50))
        cz = c_init_z
        self.l_cycle = (
            [cz] * ds + [cz + sin[k + 1] for k in range(ss)]
            + [cz] * ds + [cz] * ss + [cz]
        )
        self.l_switch = [1.0] * ds + [0.0] * ss + [1.0] * (ds + ss + 1)
        self.r_cycle = (
            [cz] * ds + [cz] * ss + [cz] * ds
            + [cz + sin[k + 1] for k in range(ss)] + [cz]
        )
        self.r_switch = (
            [1.0] * (ds + ss + ds) + [0.0] * ss + [1.0]
        )
        self.period = 2 * step_nodes
        self.c_ref = np.full((nodes + 1, self.nc), cz)
        self.cdot_switch = np.ones((nodes + 1, self.nc))
        self.w_ref = np.zeros((nodes + 1, 3))
        self.otg = np.full((nodes + 1, 1), 1e1)
        self.counter = 0

    def set(self, action):
        ns = self.nodes
        ref_id = self.counter % self.period
        for arr in (self.c_ref, self.cdot_switch):
            arr[0:ns] = arr[1 : ns + 1]
        if action == "step":
            self.w_ref[ns] = 0.0
            self.otg[ns] = 1e2
            for i in range(self.nc):
                if i < self.cm:
                    self.cdot_switch[ns, i] = self.l_switch[ref_id]
                    self.c_ref[ns, i] = self.l_cycle[ref_id]
                else:
                    self.cdot_switch[ns, i] = self.r_switch[ref_id]
                    self.c_ref[ns, i] = self.r_cycle[ref_id]
        elif action == "jump":
            self.w_ref[ns] = 0.0
            self.otg[ns] = 0.0
            self.cdot_switch[ns, :] = 0.0
        else:
            self.w_ref[ns] = 0.0
            self.otg[ns] = 1e2
            self.cdot_switch[ns, :] = 1.0
            self.c_ref[ns, :] = 0.0
        self.counter += 1


class TestWPG:
    def test_matches_oracle(self):
        ns, nc = 20, 4
        wpg = WalkingPatternGenerator.build(
            c_init_z=0.0, nodes=ns, dtype=jnp.float64
        )
        params = {
            "c_ref": jnp.zeros((ns + 1, nc), jnp.float64),
            "cdot_switch": jnp.ones((ns + 1, nc), jnp.float64),
            "w_ref": jnp.zeros((ns + 1, 3), jnp.float64),
            "orientation_tracking_gain": jnp.full((ns + 1, 1), 1e1, jnp.float64),
        }
        state = wpg.init_state()
        oracle = WPGOracle(0.0, ns)

        actions = (
            ["standing"] * 3 + ["step"] * 30 + ["jump"] * 4 + ["step"] * 10
        )
        adv = jax.jit(wpg.advance)
        for act in actions:
            params, state = adv(params, state, ACTION_CODES[act])
            oracle.set(act)
            np.testing.assert_allclose(
                np.asarray(params["c_ref"]), oracle.c_ref, atol=1e-12,
                err_msg=f"c_ref mismatch after {act}",
            )
            np.testing.assert_allclose(
                np.asarray(params["cdot_switch"]), oracle.cdot_switch,
                atol=1e-12, err_msg=f"cdot_switch mismatch after {act}",
            )
            np.testing.assert_allclose(
                np.asarray(params["orientation_tracking_gain"]), oracle.otg,
                atol=1e-12,
            )

    def test_swing_profile(self):
        """After a full left step the horizon must contain the 0.1·sin swing
        apex (wpg.py:28,37)."""
        ns = 20
        wpg = WalkingPatternGenerator.build(0.0, ns, dtype=jnp.float64)
        params = {
            "c_ref": jnp.zeros((ns + 1, 4), jnp.float64),
            "cdot_switch": jnp.ones((ns + 1, 4), jnp.float64),
        }
        state = wpg.init_state()
        for _ in range(20):
            params, state = wpg.advance(params, state, 1)
        c_ref = np.asarray(params["c_ref"])
        apex = 0.1 * np.sin(np.linspace(0, np.pi, 50))[1:9].max()
        assert np.isclose(c_ref[:, 0].max(), apex, atol=1e-9)
        # right foot swings in the second half-cycle
        assert c_ref[:, 2].max() > 0.0


class TestShift:
    def test_reference_shift_holds_terminal(self):
        ns = 5
        params = {"rdot_ref": jnp.arange((ns + 1) * 3, dtype=jnp.float64).reshape(ns + 1, 3)}
        out = shift_reference_params(params, ("rdot_ref",))
        want = np.asarray(params["rdot_ref"]).copy()
        want[0:ns] = want[1 : ns + 1]  # dsrbd_example.py:101-106
        np.testing.assert_allclose(np.asarray(out["rdot_ref"]), want)


class TestClosedLoopLIP:
    def _make_loop(self):
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(
            prob.ocp,
            DDPOptions(max_iters=30, alpha_converge_threshold=1e-12, beta=1e-3),
        )
        wpg = WalkingPatternGenerator.build(
            c_init_z=float(prob.initial_foot_position[0, 2]),
            nodes=cfg.ns,
            dtype=jnp.float64,
        )
        loop = MPCLoop(solver=solver, wpg=wpg)
        return prob, loop

    def test_standing_is_stationary(self):
        prob, loop = self._make_loop()
        carry = loop.init(prob.initial_state)
        T = 30
        carry, out = jax.jit(loop.run)(carry, standing_schedule(T, jnp.float64))
        r = np.asarray(out.x[:, 0:3])
        assert np.all(np.isfinite(np.asarray(out.x)))
        # CoM barely moves while standing
        np.testing.assert_allclose(
            r[-1], np.asarray(prob.com), atol=0.02
        )

    def test_walking_advances(self):
        """The dlip_example capability: stable closed-loop walking for ~200
        ticks (20 s) with forward progress (SURVEY.md §7.3)."""
        prob, loop = self._make_loop()
        carry = loop.init(prob.initial_state)
        T = 200
        sched = walking_schedule(T, vx=0.3, start=10, dtype=jnp.float64)
        carry, out = jax.jit(loop.run)(carry, sched)
        X = np.asarray(out.x)
        assert np.all(np.isfinite(X))
        r = X[:, 0:3]
        # CoM height stays near pendulum height the whole episode
        assert np.all(np.abs(r[:, 2] - 0.88) < 0.08), r[:, 2]
        # forward progress: the realized speed is below the 0.3 m/s terminal
        # reference (only the terminal node tracks it), but the walk must
        # cover well over a meter in ~19 s
        assert r[-1, 0] > 1.5, f"final CoM x = {r[-1, 0]}"
        # feet travel with the body (no contact left behind)
        c0_x = X[:, 3]
        assert abs(c0_x[-1] - r[-1, 0]) < 0.5
        # solver stays healthy while walking
        assert float(np.max(out.defect_norm)) < 1e-4


class TestSwingProfiles:
    """WPG swing_profile option (round 5): "reference" reproduces the
    linspace-50 quirk exactly (wpg.py:28 — only the first ss samples of
    a 50-point half-sine are used, so touchdown commands a ~5 cm drop
    in ONE node); "smooth" spreads the same 0.1 apex over the actual
    single-support nodes, removing the cliff (measured to cut the
    online serving floor 1.3e-3 → 5.9e-4, BENCH_NOTES round 5)."""

    def _cycle(self, profile):
        from srbd_horizon_tpu.wpg import WalkingPatternGenerator

        wpg = WalkingPatternGenerator.build(
            0.0, 20, swing_profile=profile
        )
        return np.asarray(wpg.l_cycle), np.asarray(wpg.l_switch)

    def test_reference_has_touchdown_cliff(self):
        z, sw = self._cycle("reference")
        # swing nodes 2..9 (ds=2, ss=8); last swing node ends high
        sin50 = 0.1 * np.sin(np.linspace(0, np.pi, 50))
        np.testing.assert_allclose(z[2:10], sin50[1:9], atol=1e-12)
        drops = z[:-1] - z[1:]
        assert drops.max() > 0.045  # the one-node ~5 cm touchdown drop

    def test_smooth_is_cliff_free_same_timing(self):
        z_r, sw_r = self._cycle("reference")
        z_s, sw_s = self._cycle("smooth")
        # identical contact timing (switch tables unchanged)
        np.testing.assert_array_equal(sw_r, sw_s)
        # same apex scale, no node-to-node step beyond ~4.1 cm
        assert abs(z_s.max() - 0.1) < 0.015
        assert np.abs(np.diff(z_s)).max() < 0.042
        # touchdown lands AT the ground (no terminal cliff)
        assert z_s[9] < 0.041  # last swing node already descending

    def test_unknown_profile_raises(self):
        import pytest

        from srbd_horizon_tpu.wpg import WalkingPatternGenerator

        with pytest.raises(ValueError, match="swing_profile"):
            WalkingPatternGenerator.build(0.0, 20, swing_profile="bezier")
