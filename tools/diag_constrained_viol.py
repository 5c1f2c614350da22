"""Constrained-serving feasibility experiment battery: measures the
steady-state scaled violation of the online AL walking tick under
candidate tick structures (CPU, small fleet). The round-3 plateau was
~2e-2, all of it contact-height (cz) swing-tracking at the first nodes
of each step cycle — this tool is the A/B evidence base for the round-4
feasibility work (VERDICT r3 item 1).

Usage: python tools/diag_constrained_viol.py [batch] [ticks]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def run(name, online_fn, offline, prob, wpg, B, ticks, dtype, shift=False):
    ns = prob.ocp.ns
    x0 = jnp.tile(prob.initial_state[None], (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(jax.random.key(11), x0.shape, dtype)
    U0 = jnp.tile(prob.static_input[None], (ns, 1))
    params = jax.tree.map(
        lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), prob.ocp.params
    )
    st0 = jax.vmap(lambda x: offline.init(x, U0=U0))(x0)
    st = jax.jit(offline.solve_batch)(st0, x0, params)

    def tick(st, params, wpg_state, action, rdot_ref):
        p1, w1 = jax.vmap(
            lambda p, s, a: wpg.advance(p, s, a)
        )(params, wpg_state, action)
        p1["rdot_ref"] = p1["rdot_ref"].at[:, 1:].set(rdot_ref[:, None, :])
        x0 = st.sol.X[:, 1]
        st1 = online_fn(st, x0, p1)
        return st1, p1, w1

    tick_j = jax.jit(tick, donate_argnums=(0, 1, 2))
    wpg_state = jax.vmap(lambda _: wpg.init_state())(jnp.arange(B))
    action = jnp.ones((B,), jnp.int32)
    rdot_ref = jnp.tile(jnp.array([[0.1, 0.0, 0.0]], dtype), (B, 1))
    st, params, wpg_state = tick_j(st, params, wpg_state, action, rdot_ref)
    jax.block_until_ready(st.viol)
    trace = []
    t0 = time.perf_counter()
    for t in range(ticks):
        st, params, wpg_state = tick_j(st, params, wpg_state, action, rdot_ref)
        trace.append(float(jnp.max(st.viol)))
    wall = (time.perf_counter() - t0) / ticks
    v = np.asarray(trace[len(trace) // 2:])   # steady-state half
    print(
        f"{name:34s} viol_max={v.max():.2e} viol_mean={v.mean():.2e} "
        f"tick_ms={wall*1e3:7.1f} iters_mean={float(jnp.mean(st.sol.iterations)):.2f} "
        f"finite={bool(jnp.all(jnp.isfinite(st.sol.X)))}"
    )
    return v.max()


def main(B=32, ticks=30):
    import dataclasses

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

    def make(max_iters=5, rho_max=1e5):
        ddp_on, al_on = al_serving_options(max_iters=max_iters)
        al_on = dataclasses.replace(al_on, rho_max=rho_max)
        return ALDDP(prob.ocp, ddp_opts=ddp_on, al_opts=al_on)

    ol = make()

    # 1. round-3 baseline: one frozen-rho outer, 5 inner
    run("baseline 1x5", ol.solve_online_batch, offline, prob, wpg, B, ticks, dtype)

    # 2. + shifted warm start (trajectory + multipliers)
    def shifted(st, x0, p):
        st = jax.vmap(ol.shift_warmstart)(st)
        return ol.solve_online_batch(st, x0, p)
    run("shift 1x5", shifted, offline, prob, wpg, B, ticks, dtype)

    # 3. two frozen outers (2x multiplier updates), 5 inner each
    def two_outer(st, x0, p):
        st = jax.vmap(ol.shift_warmstart)(st)
        st = ol.solve_online_batch(st, x0, p)
        return ol.solve_online_batch(st, x0, p)
    run("shift 2x5", two_outer, offline, prob, wpg, B, ticks, dtype)

    # 4. compute-matched: two outers, 2+3 inner
    ol2 = make(max_iters=2)
    ol3 = make(max_iters=3)
    def two_outer_23(st, x0, p):
        st = jax.vmap(ol2.shift_warmstart)(st)
        st = ol2.solve_online_batch(st, x0, p)
        return ol3.solve_online_batch(st, x0, p)
    run("shift 2x(2,3)", two_outer_23, offline, prob, wpg, B, ticks, dtype)

    # 5. higher frozen rho
    olh = make(rho_max=1e6)
    offh = ALDDP(prob.ocp, ddp_opts=ddp_off,
                 al_opts=dataclasses.replace(al_off, rho_max=1e6))
    def shifted_h(st, x0, p):
        st = jax.vmap(olh.shift_warmstart)(st)
        return olh.solve_online_batch(st, x0, p)
    run("shift 1x5 rho1e6", shifted_h, offh, prob, wpg, B, ticks, dtype)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    main(B, t)
