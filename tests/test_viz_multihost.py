"""Viz rendering and multihost-helper tests, plus jump-action closed-loop
coverage (dsrbd_example.py:128-129 'jumping' motion)."""

import numpy as np
import jax
import jax.numpy as jnp

from srbd_horizon_tpu.config import DDPOptions, SRBDConfig
from srbd_horizon_tpu.io.viz import render_matplotlib, render_walk_svg
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.parallel.multihost import (
    ensure_initialized,
    fleet_info,
    local_batch_slice,
)
from srbd_horizon_tpu.problems.lip import build_lip_problem
from srbd_horizon_tpu.runtime.loop import MPCLoop, TickInput
from srbd_horizon_tpu.solvers.msddp import MSDDP
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


class TestMultihost:
    def test_single_process_noop(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert ensure_initialized() is False

    def test_fleet_info(self):
        info = fleet_info()
        assert info["process_count"] == 1
        assert info["global_devices"] >= 8

    def test_local_batch_slice(self):
        s = local_batch_slice(64)
        assert (s.start, s.stop) == (0, 64)


class TestViz:
    def _telemetry(self):
        T = 40
        t = np.linspace(0, 4, T)
        X = np.zeros((T, 30))
        X[:, 0] = 0.3 * t            # CoM x
        X[:, 2] = 0.88
        for i in range(4):
            X[:, 3 + 3 * i] = 0.3 * t + 0.05 * i
            X[:, 3 + 3 * i + 2] = np.abs(np.sin(t * 3)) * 0.05
        return dict(
            x=X,
            solve_time_s=np.full(T, 0.01),
            defect_norm=np.full(T, 1e-8),
        )

    def _srbd_telemetry(self):
        """SRBD-layout telemetry incl. applied inputs with a gait-like
        force transfer (swing legs unloaded in alternation)."""
        T, nc = 40, 4
        t = np.linspace(0, 4, T)
        X = np.zeros((T, 37))
        X[:, 0] = 0.3 * t
        X[:, 2] = 0.88
        X[:, 6] = 1.0  # quat w
        for i in range(nc):
            X[:, 7 + 3 * i] = 0.3 * t + 0.05 * i
            X[:, 7 + 3 * i + 2] = np.abs(np.sin(t * 3)) * 0.05
        u0 = np.zeros((T, 6 * nc))
        for i in range(nc):
            # scaled units (force_scaling=1000): ~100 N modulated
            u0[:, 6 * i + 5] = 0.1 * (0.5 + 0.5 * np.sin(t * 3 + i))
            u0[:, 6 * i + 3] = 0.01 * np.cos(t * 3 + i)
        return dict(
            x=X, u0=u0,
            solve_time_s=np.full(T, 0.01),
            defect_norm=np.full(T, 1e-8),
        )

    def test_svg(self, tmp_path):
        p = tmp_path / "walk.svg"
        render_walk_svg(str(p), self._telemetry())
        content = p.read_text()
        assert content.startswith("<svg")
        assert content.count("polyline") >= 10  # CoM + 4 contacts × 2 views

    def test_svg_forces(self, tmp_path):
        """SRBD telemetry with u0 must render the /fc* role: force arrows
        on the views + an fz time-series panel (reference viz.py:29-37)."""
        p = tmp_path / "walk_srbd.svg"
        render_walk_svg(str(p), self._srbd_telemetry(), state_kind="srbd")
        content = p.read_text()
        assert "contact normal forces" in content
        assert content.count("<polygon") > 20  # arrowheads on both views
        # fz series: 4 more polylines in the force panel
        assert content.count("polyline") >= 14

    def test_svg_inertia_ellipsoid(self, tmp_path):
        """`inertia` must draw the SRBDViewer marker (reference
        viz.py:39-77): one ellipse per view at the final CoM."""
        p = tmp_path / "walk_inertia.svg"
        render_walk_svg(
            str(p), self._srbd_telemetry(), state_kind="srbd",
            inertia=np.array([2.1, 1.8, 0.62]),
        )
        content = p.read_text()
        assert content.count("<ellipse") == 2  # top + side view

    def test_inertia_axis_rule(self):
        """SRBDViewer axis rule (reference viz.py:50-53): axis i spans
        0.5·(sum of the OTHER two diagonal entries)/trace — a pancake
        body (large Izz) must render FLAT in z, not z-elongated."""
        from srbd_horizon_tpu.io.viz import _inertia_ellipsoid_radii

        pancake = np.array([1.0, 1.0, 2.0])  # mass spread in xy plane
        rw = _inertia_ellipsoid_radii(pancake)
        assert rw[2] < rw[0] and rw[2] < rw[1]
        # exact rule: rw ∝ [Iz+Iy, Iz+Ix, Ix+Iy] / trace
        expect = np.array([3.0, 3.0, 2.0]) / 4.0
        np.testing.assert_allclose(rw, expect / expect.max(), atol=1e-12)

    def test_matplotlib(self, tmp_path):
        p = tmp_path / "walk.png"
        render_matplotlib(self._telemetry(), str(p))
        assert p.exists() and p.stat().st_size > 1000

    def test_matplotlib_forces(self, tmp_path):
        p = tmp_path / "walk_srbd.png"
        fig = render_matplotlib(
            self._srbd_telemetry(), str(p), state_kind="srbd",
            inertia=np.array([2.1, 1.8, 0.62]),
        )
        assert p.exists() and p.stat().st_size > 1000

    def test_extract_contact_forces_layouts(self):
        from srbd_horizon_tpu.io.viz import extract_contact_forces

        tele = self._srbd_telemetry()
        f = extract_contact_forces(tele["u0"], 4, "srbd")
        assert f.shape == (40, 4, 3)
        # scaled (0.1) × force_scaling (1000) = 100 N peak
        assert 90.0 < f[:, :, 2].max() <= 100.5
        # isrbd layout: 6 leading accel dims then (cddot, f) per contact
        u_is = np.zeros((5, 6 + 24))
        u_is[:, 6 + 3] = 7.0  # f0 x
        fi = extract_contact_forces(u_is, 4, "isrbd")
        assert fi.shape == (5, 4, 3)
        assert np.allclose(fi[:, 0, 0], 7.0)
        assert extract_contact_forces(u_is, 4, "lip") is None


class TestJumpAction:
    def test_lip_jump_releases_contacts(self):
        """'jump' zeroes every cdot_switch at the incoming terminal node
        (wpg.py:89-93), releasing the no-slide constraint; the loop must
        stay finite through a jump burst."""
        cfg = SRBDConfig(dtype=jnp.float64)
        prob = build_lip_problem(cfg, kangaroo_line_feet())
        solver = MSDDP(prob.ocp, DDPOptions(max_iters=20))
        wpg = WalkingPatternGenerator.build(0.0, cfg.ns, dtype=jnp.float64)
        loop = MPCLoop(solver=solver, wpg=wpg)
        carry = loop.init(prob.initial_state)
        T = 30
        actions = jnp.concatenate([
            jnp.zeros(10, jnp.int32),           # stance
            jnp.full((8,), 2, jnp.int32),       # jump
            jnp.zeros(T - 18, jnp.int32),       # recover
        ])
        sched = TickInput(
            action=actions,
            rdot_ref=jnp.zeros((T, 3), jnp.float64),
            w_ref=jnp.zeros((T, 3), jnp.float64),
        )
        carry, out = jax.jit(loop.run)(carry, sched)
        assert bool(jnp.all(jnp.isfinite(out.x)))
        # during the jump burst the switches at the terminal node were 0
        assert float(jnp.min(carry.params["cdot_switch"])) >= 0.0
