"""Phase-prior experiment battery (round 5): decompose the online
serving violation by constraint family under candidate prior configs —
the evidence base for the gait-phase-indexed multiplier priors
(ALDDP.PhasePrior, VERDICT r4 item 1).

For each config, runs the walking fleet and reports the WINDOW max
violation split into: stage-eq segments (relvel / cz / NE / LIP /
lipzone), terminal-eq segments, friction cones, and the x/u box families
— so "seed λ better" work targets the family that actually binds.

Usage: python tools/diag_prior.py [batch] [ticks]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(B=16, ticks=100):
    jax.config.update("jax_platforms", "cpu")
    from srbd_horizon_tpu.config import SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP, _bound_violation
    from srbd_horizon_tpu.solvers.options import al_serving_options
    from srbd_horizon_tpu.wpg import WalkingPatternGenerator

    dtype = jnp.float32
    cfg = SRBDConfig(dtype=dtype)
    prob = build_isrbd_problem(cfg, kangaroo_line_feet())
    ddp_off, al_off = al_serving_options(max_iters=15)
    offline = ALDDP(prob.ocp, ddp_opts=ddp_off, al_opts=al_off)
    wpg = WalkingPatternGenerator.build(0.0, prob.ocp.ns, dtype=dtype)
    period = 2 * wpg.step_nodes

    nc = prob.nc
    n_relvel = 4
    # stage_eq row segments (problems/isrbd.py::stage_eq order)
    segs = [("relvel", 0, n_relvel), ("cz", n_relvel, n_relvel + nc),
            ("NE", n_relvel + nc, n_relvel + nc + 6),
            ("LIP", n_relvel + nc + 6, n_relvel + nc + 9),
            ("lipzone", n_relvel + nc + 9, n_relvel + nc + 13)]
    segs_T = [("T.relvel", 0, n_relvel), ("T.cz", n_relvel, n_relvel + nc),
              ("T.lipzone", n_relvel + nc, n_relvel + nc + 4)]

    def run(name, outers, use_prior, ema=0.5, n_ticks=ticks, full=False,
            inner_iters=1, cz_w=None):
        import dataclasses

        ocp = prob.ocp
        if cz_w is not None:
            # bump the cz rows' AL stiffness (eq_rho_weight segment
            # n_relvel..n_relvel+nc — problems/isrbd.py): beyond w~900
            # the λ += ρw·h update WINDS UP at capped inner iterations
            # (round-4 finding); with the table-seeded prior λ is
            # overwritten each tick, so higher w may now be stable
            w = np.asarray(ocp.eq_rho_weight).copy()
            w[n_relvel:n_relvel + nc] = cz_w
            w_T = np.asarray(ocp.eq_rho_weight_T).copy()
            w_T[n_relvel:n_relvel + nc] = cz_w
            ocp = dataclasses.replace(
                ocp,
                eq_rho_weight=jnp.asarray(w, dtype),
                eq_rho_weight_T=jnp.asarray(w_T, dtype),
            )
        ddp_on, al_on = al_serving_options(max_iters=inner_iters)
        online = ALDDP(ocp, ddp_opts=ddp_on, al_opts=al_on)
        ns = prob.ocp.ns
        x0 = jnp.tile(prob.initial_state[None], (B, 1))
        x0 = x0 + 0.01 * jax.random.normal(jax.random.key(11), x0.shape,
                                           dtype)
        U0 = jnp.tile(prob.static_input[None], (ns, 1))
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
            prob.ocp.params,
        )
        st = jax.jit(offline.solve_batch)(
            jax.vmap(lambda x: offline.init(x, U0=U0))(x0), x0, params
        )
        mk = (online.init_full_phase_prior if full
              else online.init_phase_prior)
        pr = jax.vmap(lambda _: mk(period, dtype))(jnp.arange(B))
        seed_fn = (online._seed_full_prior if full
                   else online._seed_from_prior)
        upd_fn = (online._update_full_prior if full
                  else online._update_prior)

        def decompose(st, params):
            h, hT, g, _ = jax.vmap(online._constraints)(
                st.sol.X, st.sol.U, params
            )
            out = {}
            for nm, a, b in segs:
                out[nm] = jnp.max(jnp.abs(h[..., a:b]))
            for nm, a, b in segs_T:
                out[nm] = jnp.max(jnp.abs(hT[..., a:b]))
            out["cone"] = jnp.max(jnp.maximum(0.0, g))
            x_lb, x_ub, u_lb, u_ub = online._bounds_from(
                {k: v[0] for k, v in params.items()}
            )
            out["xbox"] = jnp.max(_bound_violation(st.sol.X, x_lb, x_ub))
            out["ubox"] = jnp.max(_bound_violation(st.sol.U, u_lb, u_ub))
            return out

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
                st = jax.vmap(seed_fn)(st, pr, phase)
            for _ in range(outers):
                st = online.solve_online_batch(st, x0n, p1)
            if use_prior:
                pr = jax.vmap(
                    upd_fn, in_axes=(0, 0, 0, None)
                )(pr, st, phase, ema)
            return st, p1, w1, pr, decompose(st, p1)

        tick_j = jax.jit(tick, donate_argnums=(0, 1, 2, 5))
        wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
        action = jnp.ones((B,), jnp.int32)
        rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))

        hi = None
        t0 = time.perf_counter()
        for t in range(n_ticks):
            st, params, wpg_state, pr, dec = tick_j(
                st, params, wpg_state, action, rdot_ref, pr
            )
            if t >= n_ticks // 2:  # steady-state window
                dec = {k: float(v) for k, v in dec.items()}
                hi = dec if hi is None else {
                    k: max(hi[k], dec[k]) for k in dec
                }
        wall = (time.perf_counter() - t0) / n_ticks * 1e3
        total = max(hi.values())
        top = sorted(hi.items(), key=lambda kv: -kv[1])[:4]
        tops = " ".join(f"{k}={v:.2e}" for k, v in top)
        print(f"{name:28s} viol={total:.2e}  [{tops}]  tick_ms={wall:6.1f}",
              flush=True)
        return total

    # ema > 1 over-relaxes the table writeback (SOR on the cross-cycle
    # λ iteration): new = old + ema·(λ_post − old) — extra effective
    # λ-updates per cycle at zero inner cost, stability permitting
    run("1x1 FULL czw=1600 e=1.5 300t", 1, True, 1.5, full=True,
        cz_w=1600.0, n_ticks=300)
    run("1x1 FULL czw=1600 e=2.0 300t", 1, True, 2.0, full=True,
        cz_w=1600.0, n_ticks=300)
    run("1x1 FULL czw=2400 e=1.0 300t", 1, True, 1.0, full=True,
        cz_w=2400.0, n_ticks=300)
    run("1x1 FULL czw=3200 e=1.0 300t", 1, True, 1.0, full=True,
        cz_w=3200.0, n_ticks=300)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(B, t)
