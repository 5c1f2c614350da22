"""Per-row AL penalty weight grid for the constrained serving path —
round-4 feasibility work (VERDICT r3 item 1). Emulates per-row penalty
ρ_j = ρ·w_j by folding sqrt(w) into eq_scale, then measures the online
walking steady-state violation IN ORIGINAL scaled units per segment.

Key structure being probed: state-only equality rows (relvel, cz,
lipzone) never enter Quu — their penalty flows through the Riccati chain
(Vxx) where dt⁴ attenuation keeps Quu conditioned — so they can take
~100× more penalty in f32 than input-touching rows (NE, LIP).

Usage: python tools/diag_rho_weights.py [batch] [ticks]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main(B=16, ticks=40):
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
    # strip the builder's shipped eq_rho_weight (this tool emulates
    # candidate weights via eq_scale bumps; stacking both would double-
    # apply) — the shipped values came FROM this tool's grid
    prob = dataclasses.replace(
        prob,
        ocp=dataclasses.replace(
            prob.ocp, eq_rho_weight=None, eq_rho_weight_T=None
        ),
    )
    sc = np.asarray(prob.ocp.eq_scale).copy()
    # isrbd's terminal eq stack is all-geometric (unit scale, no hand
    # vector): relvel(4) + cz(4) + lipzone_z(1) + lipzone_w(3)
    scT = (np.asarray(prob.ocp.eq_scale_T).copy()
           if prob.ocp.eq_scale_T is not None else np.ones(12))
    names = (["relvel"] * 4 + ["cz"] * 4 + ["NElin"] * 3 + ["NEang"] * 3
             + ["LIP"] * 3 + ["lipzone_z"] + ["lipzone_w"] * 3)
    namesT = ["relvel"] * 4 + ["cz"] * 4 + ["lipzone_z"] + ["lipzone_w"] * 3
    seg_rows = {}
    for j, nm in enumerate(names):
        seg_rows.setdefault(nm, []).append(j)

    # weight grids: sqrt-bump per segment (w = bump²). Round-4 findings:
    # geo10/dyn3 → 5.2e-3 (from 2.1e-2); geo30+ destabilizes (multiplier
    # windup: the 5-iteration inner solve cannot track ρ_eff ≫ K and the
    # λ += ρ_eff·h update overshoots); dyn rows are f32-bounded anyway.
    grids = {
        "J cz20":             dict(relvel=10, cz=20, lipzone_z=10, lipzone_w=10,
                                   NElin=3, NEang=3, LIP=3),
        "K cz30":             dict(relvel=10, cz=30, lipzone_z=10, lipzone_w=10,
                                   NElin=3, NEang=3, LIP=3),
        "L cz45":             dict(relvel=10, cz=45, lipzone_z=10, lipzone_w=10,
                                   NElin=3, NEang=3, LIP=3),
        "M cz30 geo14":       dict(relvel=14, cz=30, lipzone_z=14, lipzone_w=14,
                                   NElin=3, NEang=3, LIP=3),
    }

    wpg = WalkingPatternGenerator.build(0.0, prob.ocp.ns, dtype=dtype)
    ns = prob.ocp.ns
    x00 = jnp.tile(prob.initial_state[None], (B, 1))
    x00 = x00 + 0.01 * jax.random.normal(jax.random.key(11), x00.shape, dtype)
    U0 = jnp.tile(prob.static_input[None], (ns, 1))

    for gname, bumps in grids.items():
        bump = np.ones_like(sc)
        bumpT = np.ones_like(scT)
        for nm, b in bumps.items():
            for j, n2 in enumerate(names):
                if n2 == nm:
                    bump[j] = b
            for j, n2 in enumerate(namesT):
                if n2 == nm:
                    bumpT[j] = b
        ocp = dataclasses.replace(
            prob.ocp,
            eq_scale=jnp.asarray(sc * bump, dtype),
            eq_scale_T=jnp.asarray(scT * bumpT, dtype),
        )
        ddp_off, al_off = al_serving_options(max_iters=15)
        offline = ALDDP(ocp, ddp_opts=ddp_off, al_opts=al_off)
        ddp_on, al_on = al_serving_options(max_iters=5)
        online = ALDDP(ocp, ddp_opts=ddp_on, al_opts=al_on)
        params = jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), ocp.params
        )
        st = jax.jit(offline.solve_batch)(
            jax.vmap(lambda x: offline.init(x, U0=U0))(x00), x00, params
        )

        def tick(st, params, wpg_state, action, rdot_ref):
            p1, w1 = jax.vmap(
                lambda p, s, a: wpg.advance(p, s, a)
            )(params, wpg_state, action)
            p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(rdot_ref[:, None, :])
            x0n = st.sol.X[:, 1]
            st = jax.vmap(online.shift_warmstart)(st)
            return (online.solve_online_batch(st, x0n, p1), p1, w1)

        tick_j = jax.jit(tick, donate_argnums=(0, 1, 2))
        wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
        action = jnp.ones((B,), jnp.int32)
        rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))
        t0 = time.perf_counter()
        for _ in range(ticks):
            st, params, wpg_state = tick_j(st, params, wpg_state, action, rdot_ref)
        wall = (time.perf_counter() - t0) / ticks
        X, U = st.sol.X, st.sol.U
        ps = {k: v[:, :ns] for k, v in params.items()}
        h = np.abs(np.asarray(
            jax.vmap(lambda X, U, p: jax.vmap(prob.ocp.stage_eq)(X[:ns], U, p)
                     )(X, U, ps))) * sc
        seg = {nm: float(h[:, :, rows].max()) for nm, rows in seg_rows.items()}
        # node-0 rows are pinned-x0 legacy (= previous tick's node-1 error);
        # report both with and without them
        h1 = h[:, 1:, :]
        print(
            f"{gname:16s} viol={h.max():.2e} viol_no_n0={h1.max():.2e} "
            f"iters={float(jnp.mean(st.sol.iterations)):.2f} "
            f"finite={bool(jnp.all(jnp.isfinite(X)))} "
            f"tick_ms={wall*1e3:6.1f} "
            f"segs={{{', '.join(f'{k}:{v:.1e}' for k, v in seg.items())}}}",
            flush=True,
        )


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    main(B, t)
