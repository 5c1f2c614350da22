"""Unit tests: quaternion utilities and SRBD/LIP dynamics vs NumPy oracles
and closed forms (SURVEY.md §4 test strategy, layer 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from srbd_horizon_tpu.math.quat import (
    quat_derivative_world,
    quat_inverse,
    quat_normalize,
    quat_product,
    quat_to_rot,
    skew,
)
from srbd_horizon_tpu.models import lip as lip_model
from srbd_horizon_tpu.models import srbd as srbd_model

from oracles import (
    lip_rddot_np,
    quat_product_np,
    quat_to_rot_np,
    srbd_accels_np,
    srbd_residual_np,
)

RNG = np.random.default_rng(0)


def rand_quat():
    q = RNG.normal(size=4)
    return q / np.linalg.norm(q)


class TestQuat:
    def test_product_vs_oracle_and_scipy(self):
        for _ in range(10):
            p, q = rand_quat(), rand_quat()
            got = np.asarray(quat_product(jnp.array(p), jnp.array(q)))
            np.testing.assert_allclose(got, quat_product_np(p, q), atol=1e-12)
            # scipy uses (x,y,z,w) too; R(p)*R(q) corresponds to p ⊗ q
            want = (R.from_quat(p) * R.from_quat(q)).as_quat()
            sign = np.sign(np.dot(got, want))
            np.testing.assert_allclose(got, sign * want, atol=1e-12)

    def test_to_rot_matches_scipy(self):
        for _ in range(10):
            q = rand_quat()
            got = np.asarray(quat_to_rot(jnp.array(q)))
            np.testing.assert_allclose(got, R.from_quat(q).as_matrix(), atol=1e-12)
            np.testing.assert_allclose(got, quat_to_rot_np(q), atol=1e-12)

    def test_inverse(self):
        q = rand_quat()
        qi = np.asarray(quat_inverse(jnp.array(q)))
        prod = quat_product_np(q, qi)
        np.testing.assert_allclose(prod, [0, 0, 0, 1], atol=1e-12)

    def test_derivative_world_frame(self):
        """Finite-difference check: rotating with world-frame angular
        velocity w for dt should match R(q + dt*qdot) to first order."""
        q = rand_quat()
        w = RNG.normal(size=3)
        dt = 1e-6
        qdot = np.asarray(quat_derivative_world(jnp.array(q), jnp.array(w)))
        q_next = q + dt * qdot
        R_next = R.from_quat(q_next / np.linalg.norm(q_next)).as_matrix()
        # world-frame angular velocity: R_next ≈ (I + dt [w]x) R(q)
        R_pred = (np.eye(3) + dt * np.asarray(skew(jnp.array(w)))) @ R.from_quat(
            q
        ).as_matrix()
        np.testing.assert_allclose(R_next, R_pred, atol=1e-9)

    def test_normalize(self):
        q = jnp.array([2.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(quat_normalize(q)), [1, 0, 0, 0], atol=1e-12
        )


class TestSRBD:
    def _rand_setup(self):
        m = 40.0
        I_body = np.diag(RNG.uniform(0.5, 3.0, size=3))
        q = rand_quat()
        Rm = R.from_quat(q).as_matrix()
        I_world = Rm @ I_body @ Rm.T
        forces = RNG.normal(size=(4, 3)) * 100
        r = RNG.normal(size=3)
        contacts = RNG.normal(size=(4, 3))
        w = RNG.normal(size=3)
        return m, I_world, forces, r, contacts, w

    def test_f_srbd_vs_oracle(self):
        m, I_world, forces, r, contacts, w = self._rand_setup()
        rddot, wdot = srbd_model.f_srbd(
            m, jnp.array(I_world), jnp.array(forces), jnp.array(r),
            jnp.array(contacts), jnp.array(w),
        )
        rddot_np, wdot_np = srbd_accels_np(m, I_world, forces, r, contacts, w)
        np.testing.assert_allclose(np.asarray(rddot), rddot_np, atol=1e-10)
        np.testing.assert_allclose(np.asarray(wdot), wdot_np, atol=1e-10)

    def test_forward_inverse_consistency(self):
        """fSRBD accelerations must zero the kin_dyn.SRBD residual — the
        reference's own runtime fidelity oracle (dsrbd_example.py:163-175)."""
        m, I_world, forces, r, contacts, w = self._rand_setup()
        rddot, wdot = srbd_model.f_srbd(
            m, jnp.array(I_world), jnp.array(forces), jnp.array(r),
            jnp.array(contacts), jnp.array(w),
        )
        res = srbd_model.srbd_residual(
            m, jnp.array(I_world), jnp.array(forces), jnp.array(r), rddot,
            jnp.array(contacts), w=jnp.array(w), wdot=wdot,
        )
        np.testing.assert_allclose(np.asarray(res), np.zeros(6), atol=1e-8)
        res_np = srbd_residual_np(
            m, I_world, forces, r, np.asarray(rddot), contacts, w, np.asarray(wdot)
        )
        np.testing.assert_allclose(res_np, np.zeros(6), atol=1e-8)

    def test_static_equilibrium(self):
        """Weight split over 4 contacts symmetric about the CoM ⇒ zero
        accelerations (the getStaticInput configuration, prb.py:242-246)."""
        m = 40.0
        I_world = np.diag([2.0, 1.8, 0.6])
        r = np.array([0.0, -0.09, 0.88])
        contacts = np.array(
            [[0.08, 0, 0], [-0.08, 0, 0], [0.08, -0.18, 0], [-0.08, -0.18, 0]]
        )
        forces = np.tile([0.0, 0.0, m * 9.81 / 4], (4, 1))
        rddot, wdot = srbd_model.f_srbd(
            m, jnp.array(I_world), jnp.array(forces), jnp.array(r),
            jnp.array(contacts), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(rddot), np.zeros(3), atol=1e-10)
        np.testing.assert_allclose(np.asarray(wdot), np.zeros(3), atol=1e-10)

    def test_xdot_layout(self):
        """srbd_xdot must place blocks exactly per prb.py:32-68 ordering."""
        nc = 4
        nx, nu = 13 + 6 * nc, 6 * nc
        x = jnp.array(RNG.normal(size=nx))
        u = jnp.array(RNG.normal(size=nu))
        constants = dict(
            m_scaled=0.04, inertia_scaled=jnp.array(np.diag([2e-3, 1.8e-3, 6e-4]))
        )
        xd = np.asarray(srbd_model.srbd_xdot(x, u, constants))
        assert xd.shape == (nx,)
        s = srbd_model.split_srbd_state(x, nc)
        # kinematic rows: position derivatives = velocities
        np.testing.assert_allclose(xd[0:3], np.asarray(s["rdot"]), atol=1e-12)
        np.testing.assert_allclose(
            xd[7 : 7 + 3 * nc], np.asarray(s["cdot"]).reshape(-1), atol=1e-12
        )
        # contact acceleration rows = cddot inputs
        i = srbd_model.split_srbd_input(u, nc)
        np.testing.assert_allclose(
            xd[13 + 3 * nc :], np.asarray(i["cddot"]).reshape(-1), atol=1e-12
        )


class TestLIP:
    def test_rddot_vs_oracle(self):
        r = np.array([0.1, -0.05, 0.9])
        z = np.array([0.0, 0.0, 0.0])
        got = np.asarray(lip_model.lip_rddot(jnp.array(r), jnp.array(z)))
        np.testing.assert_allclose(got, lip_rddot_np(r, z), atol=1e-12)

    def test_equilibrium(self):
        """ZMP directly below the CoM at pendulum height ⇒ zero xy accel and
        zero vertical accel (η² h = g)."""
        r = jnp.array([0.3, 0.2, 0.88])
        z = jnp.array([0.3, 0.2, 0.0])
        got = np.asarray(lip_model.lip_rddot(r, z))
        np.testing.assert_allclose(got, np.zeros(3), atol=1e-12)

    def test_xdot_layout(self):
        nc = 4
        nx, nu = 6 + 6 * nc, 3 + 3 * nc
        x = jnp.array(RNG.normal(size=nx))
        u = jnp.array(RNG.normal(size=nu))
        xd = np.asarray(lip_model.lip_xdot(x, u))
        s = lip_model.split_lip_state(x, nc)
        np.testing.assert_allclose(xd[0:3], np.asarray(s["rdot"]), atol=1e-12)
        np.testing.assert_allclose(
            xd[3 : 3 + 3 * nc], np.asarray(s["cdot"]).reshape(-1), atol=1e-12
        )
        np.testing.assert_allclose(xd[6 + 3 * nc :], np.asarray(u[3:]), atol=1e-12)


class TestBatching:
    def test_vmap_over_quat(self):
        qs = jnp.array(np.stack([rand_quat() for _ in range(16)]))
        Rs = jax.vmap(quat_to_rot)(qs)
        assert Rs.shape == (16, 3, 3)
        for k in range(16):
            np.testing.assert_allclose(
                np.asarray(Rs[k]),
                R.from_quat(np.array(qs[k], copy=True)).as_matrix(),
                atol=1e-12,
            )
