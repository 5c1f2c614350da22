"""Where does the stage contact-height (cz) violation live? Per-node /
per-phase decomposition of the binding constraint family under the
online serving tick — round-5 evidence for the phase-prior work.

Prints, for each serving config, the steady-state max |h_cz| by NODE
(which row of the horizon binds) and by GAIT PHASE (which cycle index
spikes), plus which contact.

Usage: python tools/diag_cz_nodes.py [batch] [ticks]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(B=8, ticks=120):
    jax.config.update("jax_platforms", "cpu")
    from srbd_horizon_tpu.config import SRBDConfig
    from srbd_horizon_tpu.models.kangaroo import kangaroo_line_feet
    from srbd_horizon_tpu.problems.isrbd import build_isrbd_problem
    from srbd_horizon_tpu.solvers.alddp import ALDDP
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
    cz_sl = slice(n_relvel, n_relvel + nc)

    def run(name, outers, use_prior, full=False, cz_w=None):
        import dataclasses

        ocp = prob.ocp
        if cz_w is not None:
            w = np.asarray(ocp.eq_rho_weight).copy()
            w[n_relvel:n_relvel + nc] = cz_w
            w_T = np.asarray(ocp.eq_rho_weight_T).copy()
            w_T[n_relvel:n_relvel + nc] = cz_w
            ocp = dataclasses.replace(
                ocp, eq_rho_weight=jnp.asarray(w, dtype),
                eq_rho_weight_T=jnp.asarray(w_T, dtype))
        ddp_on, al_on = al_serving_options(max_iters=1)
        online = ALDDP(ocp, ddp_opts=ddp_on, al_opts=al_on)
        seed_fn = (online._seed_full_prior if full
                   else online._seed_from_prior)
        upd_fn = (online._update_full_prior if full
                  else online._update_prior)
        mk = (online.init_full_phase_prior if full
              else online.init_phase_prior)
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
        pr = jax.vmap(lambda _: mk(period, dtype))(jnp.arange(B))

        def cz_by_node(st, params):
            h, hT, _, _ = jax.vmap(online._constraints)(
                st.sol.X, st.sol.U, params
            )
            # (B, ns, nc) -> max over fleet: (ns, nc)
            return jnp.max(jnp.abs(h[..., cz_sl]), axis=0)

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
                )(pr, st, phase, 1.0)
            return st, p1, w1, pr, cz_by_node(st, p1), phase[0]

        tick_j = jax.jit(tick, donate_argnums=(0, 1, 2, 5))
        wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
        action = jnp.ones((B,), jnp.int32)
        rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))

        by_node = np.zeros((prob.ocp.ns, nc))
        by_phase = np.zeros(period)
        for t in range(ticks):
            st, params, wpg_state, pr, cz, ph = tick_j(
                st, params, wpg_state, action, rdot_ref, pr
            )
            if t >= ticks // 2:
                cz = np.asarray(cz)
                by_node = np.maximum(by_node, cz)
                by_phase[int(ph)] = max(by_phase[int(ph)], cz.max())
        node_max = by_node.max(axis=1)
        print(f"\n{name}: overall cz max = {by_node.max():.2e}")
        print("  by node: " + " ".join(
            f"{v:.0e}" if v > 1e-5 else "." for v in node_max
        ))
        print(f"  argmax node = {int(node_max.argmax())}, contact "
              f"profile at that node: "
              + " ".join(f"{v:.1e}" for v in by_node[node_max.argmax()]))
        print("  by phase: " + " ".join(
            f"{v:.0e}" if v > 1e-5 else "." for v in by_phase
        ))

    run("1x1 FULL prior czw=3200", 1, True, full=True, cz_w=3200.0)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    main(B, t)
