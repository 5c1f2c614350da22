"""Gait-phase-indexed AL multiplier priors (solvers/alddp.py PhasePrior /
FullPhasePrior — round-5 serving work, VERDICT r4 item 1).

Unit semantics: table indexing (tail row holds the PREVIOUS tick's
terminal write → phase−1), first-visit copy vs EMA blend, seen-gating
(unvisited phases fall back to the rolled multipliers).

Integration pin: on the online walking fleet, the 1-outer serving tick
with the full-field prior at cz stiffness 1600 must (a) beat the same
tick without the prior by a wide margin, and (b) hold the measured
steady-state envelope — the battery evidence is tools/diag_prior.py
(1.39e-3 over 300 ticks vs 3.46e-3 without the prior; the round-4
2-outer config held 1.93e-3 at twice the inner work)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from srbd_horizon_tpu.config import SRBDConfig
from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
from srbd_horizon_tpu.solvers.alddp import ALDDP
from srbd_horizon_tpu.solvers.options import al_serving_options
from srbd_horizon_tpu.wpg import WalkingPatternGenerator


def _solver(cz_w=400.0, max_iters=1):
    cfg = SRBDConfig(dtype=jnp.float32)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet(),
                               cz_rho_weight=cz_w)
    ddp, al = al_serving_options(max_iters=max_iters)
    return prob, ALDDP(prob.ocp, ddp_opts=ddp, al_opts=al)


class TestPriorSemantics:
    def test_tail_prior_indexing_and_gating(self):
        prob, al = _solver()
        P = 20
        pr = al.init_phase_prior(P, jnp.float32)
        st = al.init(prob.initial_state)
        n_eq = st.lam_eq.shape[1]

        # unvisited phase: seeding leaves the rolled multipliers alone
        st1 = st._replace(lam_eq=st.lam_eq.at[-1].set(7.0))
        out = al._seed_from_prior(st1, pr, jnp.asarray(5))
        np.testing.assert_array_equal(np.asarray(out.lam_eq[-1]),
                                      np.full(n_eq, 7.0))

        # update at phase 5 writes the TAIL table at phase-1=4 and the
        # terminal table at phase 5; first visit copies
        st2 = st._replace(
            lam_eq=st.lam_eq.at[-1].set(3.0),
            lam_eq_T=jnp.full_like(st.lam_eq_T, 2.0),
        )
        pr = al._update_prior(pr, st2, jnp.asarray(5), 0.5)
        assert bool(pr.seen_tail[4]) and not bool(pr.seen_tail[5])
        assert bool(pr.seen_T[5])
        np.testing.assert_array_equal(np.asarray(pr.lam_tail[4]),
                                      np.full(n_eq, 3.0))

        # seeding at phase 5 now pulls table[4] into the tail row
        out = al._seed_from_prior(st1, pr, jnp.asarray(5))
        np.testing.assert_array_equal(np.asarray(out.lam_eq[-1]),
                                      np.full(n_eq, 3.0))
        np.testing.assert_array_equal(np.asarray(out.lam_eq_T),
                                      np.full_like(st.lam_eq_T, 2.0))

        # second visit EMA-blends (0.5): 3.0 -> blend with 5.0 = 4.0
        st3 = st2._replace(lam_eq=st.lam_eq.at[-1].set(5.0))
        pr = al._update_prior(pr, st3, jnp.asarray(5), 0.5)
        np.testing.assert_allclose(np.asarray(pr.lam_tail[4]),
                                   np.full(n_eq, 4.0), rtol=1e-6)

    def test_full_prior_replaces_whole_field(self):
        prob, al = _solver()
        P = 20
        pr = al.init_full_phase_prior(P, jnp.float32)
        st = al.init(prob.initial_state)

        # first visit copies the whole field; seen gates per phase
        st1 = st._replace(lam_eq=jnp.full_like(st.lam_eq, 1.5),
                          lam_eq_T=jnp.full_like(st.lam_eq_T, -2.0))
        pr = al._update_full_prior(pr, st1, jnp.asarray(3), 1.0)
        assert bool(pr.seen[3]) and not bool(pr.seen[4])

        st2 = st._replace(lam_eq=jnp.full_like(st.lam_eq, 9.0))
        out = al._seed_full_prior(st2, pr, jnp.asarray(3))
        np.testing.assert_array_equal(np.asarray(out.lam_eq),
                                      np.asarray(st1.lam_eq))
        np.testing.assert_array_equal(np.asarray(out.lam_eq_T),
                                      np.asarray(st1.lam_eq_T))
        # unvisited phase 4: rolled field kept
        out4 = al._seed_full_prior(st2, pr, jnp.asarray(4))
        np.testing.assert_array_equal(np.asarray(out4.lam_eq),
                                      np.asarray(st2.lam_eq))

    def test_serving_tick_batch_returns_prior(self):
        """serving_tick_batch with a prior returns (state, prior) and
        marks the visited phases seen; without one, state only
        (round-4 call signature preserved)."""
        prob, al = _solver()
        B, ns = 2, prob.ocp.ns
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        U0 = jnp.tile(prob.static_input[None], (ns, 1))
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        st = jax.vmap(lambda x: al.init(x, U0=U0))(x0)
        out = al.serving_tick_batch(st, x0, params, outers=1)
        assert type(out).__name__ == "ALState"

        pr = jax.vmap(lambda _: al.init_full_phase_prior(20, jnp.float32))(
            jnp.arange(B)
        )
        phase = jnp.zeros((B,), jnp.int32)
        st2, pr2 = al.serving_tick_batch(
            st, x0, params, outers=1, prior=pr, phase=phase
        )
        assert bool(jnp.all(pr2.seen[:, 0]))
        assert not bool(jnp.any(pr2.seen[:, 1:]))


class TestPriorServingImprovement:
    def test_one_outer_prior_beats_no_prior(self):
        """The round-5 pin: the 1-outer serving tick with the full-field
        prior at czw=1600 must clearly beat the identical tick without
        the prior, and hold the measured steady-state envelope."""
        prob, online = _solver(cz_w=1600.0, max_iters=1)
        ddp_off, al_off = al_serving_options(max_iters=15)
        offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
        dtype = jnp.float32
        B, ns = 8, prob.ocp.ns
        wpg = WalkingPatternGenerator.build(0.0, ns, dtype=dtype)
        period = 2 * wpg.step_nodes

        def run(use_prior, ticks=120):
            x0 = jnp.tile(prob.initial_state[None], (B, 1))
            x0 = x0 + 0.01 * jax.random.normal(
                jax.random.key(11), x0.shape, dtype
            )
            U0 = jnp.tile(prob.static_input[None], (ns, 1))
            params = jax.tree.map(
                lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
                prob.ocp.params,
            )
            st = jax.jit(offline.solve_batch)(
                jax.vmap(lambda x: offline.init(x, U0=U0))(x0), x0, params
            )
            pr = jax.vmap(
                lambda _: online.init_full_phase_prior(period, dtype)
            )(jnp.arange(B))

            def tick(st, params, wpg_state, action, rdot_ref, pr):
                phase = wpg_state.step_counter % period
                p1, w1 = jax.vmap(
                    lambda p, s, a: wpg.advance(p, s, a)
                )(params, wpg_state, action)
                p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(
                    rdot_ref[:, None, :]
                )
                x0n = st.sol.X[:, 1]
                st = jax.vmap(online.shift_warmstart)(st)
                if use_prior:
                    st = jax.vmap(online._seed_full_prior)(st, pr, phase)
                st = online.solve_online_batch(st, x0n, p1)
                if use_prior:
                    pr = jax.vmap(
                        online._update_full_prior, in_axes=(0, 0, 0, None)
                    )(pr, st, phase, 1.0)
                return st, p1, w1, pr

            tick_j = jax.jit(tick, donate_argnums=(0, 1, 2, 5))
            wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
            action = jnp.ones((B,), jnp.int32)
            rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype),
                                (B, 1))
            hi = 0.0
            for t in range(ticks):
                st, params, wpg_state, pr = tick_j(
                    st, params, wpg_state, action, rdot_ref, pr
                )
                if t >= ticks // 2:
                    hi = max(hi, float(jnp.max(st.viol)))
            assert bool(jnp.all(jnp.isfinite(st.sol.X)))
            return hi

        with_prior = run(True)
        without = run(False)
        # measured: 1.39-1.63e-3 with, 3.4-3.5e-3 without (B=16, CPU);
        # generous envelopes so only a real regression trips
        assert with_prior < 2.5e-3, with_prior
        assert without > 2.0e-3, without
        assert with_prior < 0.8 * without, (with_prior, without)
