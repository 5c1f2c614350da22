"""Cartpole swing-up MPC — a USER-DEFINED problem on the framework.

The reference's problem layer is the general Horizon trajectory-
optimization framework (SURVEY.md §2.2 X6): a user can register arbitrary
dynamics/costs, not just the shipped LIP/SRBD problems (the reference's
prb.py and isrbd_example.py are exactly such user problem builds). This
example is the equivalent demonstration here: a ~60-line OCP nobody
shipped — cartpole swing-up — defined with the public `OCP` spec and
solved by the same MS-DDP engine (and the same batched/TPU hot path) as
the locomotion problems.

  state  x = [p, theta, pdot, thetadot]   (theta = 0 upright)
  input  u = [force on the cart]
  cost   upright/centre tracking (node-weighted ramp) + small effort
  terminal: strong upright tracking

Run:  python examples/cartpole_example.py [--ticks N] [--plot out.svg]
(CPU by default — the problem is tiny; pass --tpu to run on the default
backend.)
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_cartpole_ocp(ns=60, dt=0.05, dtype=None):
    """Swing-up OCP over ns nodes. Returns (ocp, x0_down)."""
    import jax.numpy as jnp

    from srbd_horizon_tpu.ocp.layout import VarLayout
    from srbd_horizon_tpu.ocp.spec import OCP, node_mask

    dtype = dtype or jnp.float64
    mc, mp, l, g = 1.0, 0.2, 0.5, 9.81

    def xdot(x, u, p):
        del p
        th, pdot, thdot = x[1], x[2], x[3]
        f = u[0]
        s, c = jnp.sin(th), jnp.cos(th)
        # standard cartpole (pole pivot on cart; theta from upright)
        denom = mc + mp * s * s
        pddot = (f + mp * s * (l * thdot**2 - g * c)) / denom
        thddot = (-f * c - mp * l * thdot**2 * s * c + (mc + mp) * g * s) / (
            l * denom
        )
        return jnp.stack([pdot, thdot, pddot, thddot])

    def step(x, u, p, dt_):
        return x + dt_ * xdot(x, u, p)

    def stage_residual(x, u, p):
        # node-ramped upright tracking (let early nodes swing freely),
        # cart-centre tracking, small effort + velocity damping
        w = p["w_track"]
        return jnp.concatenate([
            w * 3.0 * jnp.sin(0.5 * x[1])[None],   # pole angle error
            w * 0.3 * x[0][None],                  # cart centre
            0.05 * x[2:4],                         # velocity damping
            0.02 * u,                              # effort
        ])

    def terminal_residual(x, p):
        del p
        return jnp.concatenate([
            30.0 * jnp.sin(0.5 * x[1])[None],
            3.0 * x[0][None],
            3.0 * x[2:4],
        ])

    # ramp from 0.1 to 1 over the horizon; a parameter so the MPC loop can
    # shift/retarget it per tick like the locomotion references
    ramp = (0.1 + 0.9 * jnp.linspace(0.0, 1.0, ns + 1)).astype(dtype)
    ocp = OCP(
        ns=ns, dt=float(dt),
        state_layout=VarLayout([("p", 1), ("theta", 1),
                                ("pdot", 1), ("thetadot", 1)]),
        input_layout=VarLayout([("force", 1)]),
        step=step, xdot=xdot,
        stage_residual=stage_residual, terminal_residual=terminal_residual,
        params={"w_track": ramp[:, None]},
        # dynamics sparsity: rows 0,1 of A−I are pure integrator chains
        # (xdot rows p/theta depend only on pdot/thetadot — still
        # x-dependent, so live); B touches only the acceleration rows
        dynamics_x_rows=tuple(range(4)),
        dynamics_u_rows=(2, 3),
        residual_x_rows=(0, 1, 2, 3),
        residual_u_rows=(4,),
    )
    x0 = jnp.array([0.0, 3.14159265, 0.0, 0.0], dtype)  # hanging down
    return ocp, x0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--plot", type=str, default="")
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from srbd_horizon_tpu.config import DDPOptions
    from srbd_horizon_tpu.solvers.msddp import MSDDP

    ocp, x0 = build_cartpole_ocp()
    solver = MSDDP(ocp, DDPOptions(
        max_iters=200, alpha_converge_threshold=1e-12, beta=1e-4,
        cost_reduction_ths=1e-12,
    ))
    # offline swing-up plan
    sol = jax.jit(solver.solve)(solver.init(x0), x0, ocp.params)
    print(f"offline: cost={float(sol.cost):.4f} "
          f"iters={int(sol.iterations)} "
          f"defect={float(sol.defect_norm):.2e} "
          f"theta_end={float(sol.X[-1, 1]):+.4f} rad")

    # closed-loop MPC: apply u0, re-solve warm-started (online budget)
    online = MSDDP(ocp, DDPOptions(
        max_iters=5, alpha_converge_threshold=1e-12, beta=1e-4,
    ))
    tick = jax.jit(online.solve)
    x = x0
    hist = [np.asarray(x)]
    for t in range(args.ticks):
        sol = tick(sol, x, ocp.params)
        u0 = sol.U[0]
        x = ocp.step(x, u0, ocp.params_at(ocp.params, 0), ocp.dt)
        hist.append(np.asarray(x))
    hist = np.asarray(hist)
    print(f"closed loop ({args.ticks} ticks): "
          f"theta_final={hist[-1, 1]:+.4f} rad "
          f"p_final={hist[-1, 0]:+.4f} m "
          f"|thetadot|_final={abs(hist[-1, 3]):.4f}")

    if args.plot:
        from srbd_horizon_tpu.io.viz import render_series_svg

        render_series_svg(
            args.plot,
            [("theta [rad]", hist[:, 1]), ("cart p [m]", hist[:, 0])],
            title="cartpole swing-up MPC",
        )
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
