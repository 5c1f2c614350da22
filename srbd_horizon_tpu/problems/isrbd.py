"""ISRBD full-NLP walking OCP — TPU-native rebuild of the inline problem in
isrbd_example.py:42-353 (the reference's full-fidelity IPOPT/gnsqp path).

Differences from the SRBD-DDP problem (problems/srbd.py):
  - accelerations are INPUTS (rddot, wdot created as input variables,
    isrbd_example.py:109-110), dynamics is a pure double integrator with
    floating base (isrbd_example.py:131); physics enters as CONSTRAINTS:
      * SRBD Newton–Euler constraint on nodes 0..9 (isrbd_example.py:347)
      * LIP constraint on nodes 10..ns-1 (isrbd_example.py:348) — the
        hybrid model schedule; the missing `lip.LIP_dynamics` module is
        reconstructed in models/lip.py
      * LIP-zone consistency: fixed CoM height + zero angular momentum on
        nodes 5..ns (isrbd_example.py:352-353)
  - friction cones are ACTIVE inequality constraints (isrbd_example.py:
    312-318), forces bounded ±max_contact_force (isrbd_example.py:200)
  - forces are UNSCALED (no force_scaling here; m and I enter raw,
    isrbd_example.py:336-344)
  - transcription: multiple shooting with RK2 (isrbd_example.py:135)
  - the o_tracking gain `Wo` is a parameter initialized to 0
    (isrbd_example.py:236-238)

The hybrid model schedule is expressed as 0/1 parameter masks over nodes
(mask_srbd / mask_lip / mask_lipzone), so the reference's open TODO
"implement LIP-based model scheduler" (README.md:7) becomes runtime data:
schedules can be changed per tick or per scenario without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

from srbd_horizon_tpu.config import SRBDConfig
from srbd_horizon_tpu.math.quat import quat_derivative_world
from srbd_horizon_tpu.models import lip as lip_model
from srbd_horizon_tpu.models import srbd as srbd_model
from srbd_horizon_tpu.models.kangaroo import RobotConstants
from srbd_horizon_tpu.ocp import integrators
from srbd_horizon_tpu.ocp.layout import VarLayout
from srbd_horizon_tpu.ocp.spec import OCP, node_mask
from srbd_horizon_tpu.ocp.spec import unbounded as spec_unbounded
from srbd_horizon_tpu.problems.srbd import linearized_friction_cone_rows


@dataclasses.dataclass(frozen=True)
class ISRBDProblem:
    ocp: OCP
    initial_state: jnp.ndarray
    static_input: jnp.ndarray
    com: jnp.ndarray
    initial_foot_position: jnp.ndarray
    inertia: jnp.ndarray
    mass: float
    nc: int
    contact_model: int


def _layouts(nc: int):
    state_entries = [("r", 3), ("o", 4)]
    state_entries += [(f"c{i}", 3) for i in range(nc)]
    state_entries += [("rdot", 3), ("w", 3)]
    state_entries += [(f"cdot{i}", 3) for i in range(nc)]
    # input creation order isrbd_example.py:109-126: rddot, wdot, then
    # (cddot_i, f_i) per contact
    input_entries = [("rddot", 3), ("wdot", 3)]
    for i in range(nc):
        input_entries += [(f"cddot{i}", 3), (f"f{i}", 3)]
    return VarLayout(state_entries), VarLayout(input_entries)


def build_isrbd_problem(
    cfg: SRBDConfig,
    robot: RobotConstants,
    dtype=None,
    srbd_nodes: int = 10,
    lipzone_start: int = 5,
    cz_rho_weight: float = 400.0,
) -> ISRBDProblem:
    dtype = dtype or cfg.dtype
    ns, nc, cm = cfg.ns, cfg.nc, cfg.contact_model
    state_layout, input_layout = _layouts(nc)

    com = jnp.asarray(robot.com, dtype)
    feet0 = jnp.asarray(robot.foot_positions, dtype)
    inertia = jnp.asarray(robot.inertia, dtype)
    m = float(robot.mass)

    # The hybrid stack couples the LIP pendulum height to the LIP-zone
    # CoM-height pin (r_z = com_z): with the ZMP pivot on the ground
    # plane, consistency needs η² = g / com_z, i.e. cfg.lip_height ≈ the
    # robot's CoM height. A mismatch makes the z-rows structurally
    # inconsistent by η²·|com_z − lip_height| m/s² — e.g. the quadruped
    # (com_z 0.40) at the biped default (0.88) carries an irreducible
    # ~5 m/s² conflict. Guard it at build time.
    if abs(cfg.lip_height - float(com[2])) > 0.05:
        raise ValueError(
            f"cfg.lip_height={cfg.lip_height} inconsistent with the "
            f"robot's CoM height {float(com[2]):.3f}: the LIP-zone "
            f"constraints need SRBDConfig(lip_height=<CoM height>) "
            f"(quadruped: lip_height=float(robot.com[2]))"
        )

    # foot-pair indices fpi (isrbd_example.py:277-283)
    fpi = []
    for leg in range(cfg.number_of_legs):
        if cm == 1:
            fpi.append(leg)
        else:
            fpi.append(leg * cm)
            fpi.append(leg * cm + cm - 1)
    d1 = feet0[fpi[2], :2] - feet0[fpi[0], :2]  # isrbd_example.py:285
    d2 = feet0[fpi[3], :2] - feet0[fpi[1], :2]  # isrbd_example.py:288

    # python-float weights: numpy f64 scalars are strong types under
    # jax x64 and would promote f32 residuals to f64
    sq = lambda g: float(np.sqrt(g))
    w_rz = sq(cfg.rz_tracking_gain_isrbd)      # isrbd_example.py:229
    w_rdot = sq(cfg.rdot_tracking_gain)
    w_w = sq(cfg.w_tracking_gain)
    w_rel = 1e2                                # raw 1e2 (isrbd_example.py:286-290)
    w_qddot = sq(cfg.min_qddot_gain)
    w_minf = sq(cfg.min_f_gain)                # unscaled (isrbd_example.py:299)

    def split(x, u):
        s = srbd_model.split_srbd_state(x, nc)
        i = dict(
            rddot=u[0:3],
            wdot=u[3:6],
        )
        rest = u[6:].reshape(nc, 6)
        i["cddot"] = rest[:, 0:3]
        i["f"] = rest[:, 3:6]
        return s, i

    def stage_residual(x, u, p):
        s, i = split(x, u)
        mt = p["mask_track"][0]
        Wo = p["Wo"][0]
        qddot = jnp.concatenate([i["rddot"], i["wdot"], i["cddot"].reshape(-1)])
        res = [
            mt * w_rz * (s["r"][2:3] - com[2]),            # isrbd:231
            mt * Wo * (s["o"] - jnp.array([0, 0, 0, 1], dtype)),  # isrbd:238
            mt * w_rdot * (s["rdot"] - p["rdot_ref"]),     # isrbd:245
            mt * w_w * (s["w"] - p["w_ref"]),              # isrbd:252
            w_qddot * qddot,                               # isrbd:259
            w_rel * (-s["c"][fpi[0], 1] + s["c"][fpi[2], 1] - d1[1])[None],
            w_rel * (-s["c"][fpi[0], 0] + s["c"][fpi[2], 0] - d1[0])[None],
            w_rel * (-s["c"][fpi[1], 1] + s["c"][fpi[3], 1] - d2[1])[None],
            w_rel * (-s["c"][fpi[1], 0] + s["c"][fpi[3], 0] - d2[0])[None],
            (w_minf * i["f"]).reshape(-1),                 # isrbd:299
        ]
        return jnp.concatenate(res)

    def terminal_residual(x, p):
        s = srbd_model.split_srbd_state(x, nc)
        Wo = p["Wo"][0]
        res = [
            w_rz * (s["r"][2:3] - com[2]),
            Wo * (s["o"] - jnp.array([0, 0, 0, 1], dtype)),
            w_rdot * (s["rdot"] - p["rdot_ref"]),
            w_w * (s["w"] - p["w_ref"]),
            w_rel * (-s["c"][fpi[0], 1] + s["c"][fpi[2], 1] - d1[1])[None],
            w_rel * (-s["c"][fpi[0], 0] + s["c"][fpi[2], 0] - d1[0])[None],
            w_rel * (-s["c"][fpi[1], 1] + s["c"][fpi[3], 1] - d2[1])[None],
            w_rel * (-s["c"][fpi[1], 0] + s["c"][fpi[3], 0] - d2[0])[None],
        ]
        return jnp.concatenate(res)

    def stage_eq(x, u, p):
        s, i = split(x, u)
        res = []
        # relative_vel pairs (isrbd_example.py:325-329)
        for leg in range(cfg.number_of_legs):
            base = leg * cm
            for k in range(1, cm):
                res.append(s["cdot"][base, :2] - s["cdot"][base + k, :2])
        # cz_tracking (hard constraint here, isrbd_example.py:306)
        res.append(s["c"][:, 2] - p["c_ref"])
        # hybrid dynamics constraints
        I_world = srbd_model.world_inertia(inertia, s["o"])
        srbd_res = srbd_model.srbd_residual(
            m, I_world, i["f"], s["r"], i["rddot"], s["c"], s["w"], i["wdot"]
        )
        res.append(p["mask_srbd"][0] * srbd_res)           # nodes 0..9
        lip_res = lip_model.lip_dynamics_residual(
            m, i["f"], s["r"], i["rddot"], s["c"], eta2=cfg.eta2
        )
        res.append(p["mask_lip"][0] * lip_res)             # nodes 10..ns-1
        # LIP-zone consistency (isrbd_example.py:352-353)
        res.append(p["mask_lipzone"][0] * (s["r"][2:3] - com[2]))
        res.append(p["mask_lipzone"][0] * s["w"])
        return jnp.concatenate(res)

    def terminal_eq(x, p):
        s = srbd_model.split_srbd_state(x, nc)
        res = []
        for leg in range(cfg.number_of_legs):
            base = leg * cm
            for k in range(1, cm):
                res.append(s["cdot"][base, :2] - s["cdot"][base + k, :2])
        res.append(s["c"][:, 2] - p["c_ref"])
        res.append(p["mask_lipzone"][0] * (s["r"][2:3] - com[2]))
        res.append(p["mask_lipzone"][0] * s["w"])
        return jnp.concatenate(res)

    # Equality-row scaling (ocp/spec.py::OCP.eq_scale): the NE and LIP
    # dynamics rows are in newtons / newton-meters (O(m·g) ≈ 400) while
    # every other row is meters / m/s / rad/s (O(1)). Scaling the force
    # rows by 1/(m·g) puts the whole stack in comparable units — the AL
    # solver then converges at f32-safe penalties (ρ ≤ 1e5) instead of
    # needing ρ→1e8 (f64-only); see solvers/alddp.py. Row order follows
    # stage_eq below: rel-vel pairs, cz, NE (6), LIP (3), lipzone (4).
    n_relvel = cfg.number_of_legs * (cm - 1) * 2
    eq_scale = np.ones(n_relvel + nc + 6 + 3 + 4)
    eq_scale[n_relvel + nc : n_relvel + nc + 9] = 1.0 / (m * 9.81)
    eq_scale = jnp.asarray(eq_scale, dtype)

    # Per-row AL penalty stiffness (OCP.eq_rho_weight — see the physics
    # note there). Geometric STATE-ONLY rows ride the dt²/2 integrator
    # gain (K ≈ 6.4e5 ≫ the f32-safe shared ρ=1e5) and bypass Quu, so
    # they take w=100 (relvel, lipzone) / 400 (cz, the binding swing-
    # tracking rows); the input-touching NE/LIP dynamics rows keep w=9
    # (their penalty lands in Quu — f32-bounded). Measured on the online
    # walking fleet (tools/diag_rho_weights.py, 80 ticks): steady-state
    # scaled violation 2.1e-2 → 2.0e-3; w beyond ~900 on any row
    # destabilizes (multiplier windup — the 5-iteration inner solve can
    # no longer track the λ += ρw·h update).
    #
    # `cz_rho_weight` (default 400 — the round-4 windup-safe value)
    # overrides the cz-row stiffness: with the gait-phase multiplier
    # PRIOR (solvers/alddp.py::FullPhasePrior — λ is overwritten from
    # per-phase tables each tick instead of integrated through the
    # windup-prone λ += ρw·h), the windup ceiling disappears and
    # serving configs run cz at w=1600-3200 (round-5 battery,
    # tools/diag_prior.py: 1-outer serving at czw=1600 + prior holds
    # 1.39e-3 over 300 ticks vs 1.93e-3 for the 2-outer w=400 config;
    # WITHOUT the prior the same stiffness floors at 3.5e-3).
    eq_rho_w = np.ones(n_relvel + nc + 6 + 3 + 4)
    eq_rho_w[:n_relvel] = 100.0
    eq_rho_w[n_relvel : n_relvel + nc] = cz_rho_weight
    eq_rho_w[n_relvel + nc : n_relvel + nc + 9] = 9.0
    eq_rho_w[n_relvel + nc + 9 :] = 100.0
    eq_rho_w_T = np.ones(n_relvel + nc + 4)
    eq_rho_w_T[:n_relvel] = 100.0
    eq_rho_w_T[n_relvel : n_relvel + nc] = cz_rho_weight
    eq_rho_w_T[n_relvel + nc :] = 100.0

    # inequalities: friction cones (active!, isrbd:316-318)
    A_fc = jnp.asarray(
        linearized_friction_cone_rows(cfg.friction_cone_coefficient), dtype
    )

    def stage_ineq(x, u, p):
        del p
        _, i = split(x, u)
        return (i["f"] @ A_fc.T).reshape(-1)    # ≤ 0 (isrbd:316-318)

    ineq_ub = jnp.zeros(nc * 5, dtype)
    ineq_lb = jnp.full((nc * 5,), -jnp.inf, dtype)

    # variable box bounds (the reference's setBounds surface):
    #   forces f_i ∈ [−max_contact_force, max_contact_force]
    #     (isrbd_example.py:200) — a box on input slices
    #   contact velocities cdot_i ∈ [−max_velocity, max_velocity]
    #     (isrbd_example.py steps_phase max_velocity kwarg / global cdot
    #     bounds) — a box on state slices
    u_lb, u_ub = spec_unbounded(ns, input_layout.total, dtype)
    fmax = cfg.max_contact_force
    for i in range(nc):
        sl = input_layout.slices[f"f{i}"]
        u_lb = u_lb.at[:, sl].set(-fmax)
        u_ub = u_ub.at[:, sl].set(fmax)
    x_lb, x_ub = spec_unbounded(ns + 1, state_layout.total, dtype)
    vmax = cfg.max_contact_velocity
    for i in range(nc):
        sl = state_layout.slices[f"cdot{i}"]
        x_lb = x_lb.at[:, sl].set(-vmax)
        x_ub = x_ub.at[:, sl].set(vmax)

    def xdot(x, u, p):
        """double_integrator_with_floating_base with input accelerations
        (isrbd_example.py:131)."""
        del p
        s, i = split(x, u)
        odot = quat_derivative_world(s["o"], s["w"])
        return jnp.concatenate([
            s["rdot"], odot, s["cdot"].reshape(-1),
            i["rddot"], i["wdot"], i["cddot"].reshape(-1),
        ])

    step = integrators.rk2(xdot)  # isrbd_example.py:135 (RK2 shooting)

    params: Dict[str, jnp.ndarray] = {
        "rdot_ref": jnp.zeros((ns + 1, 3), dtype),         # isrbd:84-85
        "w_ref": jnp.zeros((ns + 1, 3), dtype),            # isrbd:89-90
        "Wo": jnp.zeros((ns + 1, 1), dtype),               # isrbd:236-237
        "c_ref": jnp.tile(feet0[:, 2], (ns + 1, 1)),       # isrbd:304-305
        "cdot_switch": jnp.ones((ns + 1, nc), dtype),      # for WPG reuse
        "mask_track": node_mask(ns, 1, ns + 1, dtype)[:, None],
        "mask_srbd": node_mask(ns, 0, srbd_nodes, dtype)[:, None],
        "mask_lip": node_mask(ns, srbd_nodes, ns, dtype)[:, None],
        "mask_lipzone": node_mask(ns, lipzone_start, ns + 1, dtype)[:, None],
    }

    # Stacked-row sparsity over [stage_residual; stage_eq] (the MS-DDP
    # penalty stack — msddp._stage_rho — and the base the AL solver
    # composes its inner-stack metadata from). Segment table mirrors the
    # residual/eq definitions above; "xu" rows touch both.
    n_qddot = 6 + 3 * nc
    res_segments = [
        (1, "x"), (4, "x"), (3, "x"), (3, "x"),   # rz, o, rdot, w
        (n_qddot, "u"), (4, "x"), (3 * nc, "u"),  # qddot, rel, min_f
    ]
    eq_segments = [
        (n_relvel, "x"), (nc, "x"),               # rel-vel pairs, cz
        (6, "xu"), (3, "xu"), (4, "x"),           # NE, LIP, lipzone
    ]
    res_x_rows, res_u_rows = [], []
    off = 0
    for size, dep in res_segments + eq_segments:
        if "x" in dep:
            res_x_rows.extend(range(off, off + size))
        if "u" in dep:
            res_u_rows.extend(range(off, off + size))
        off += size

    # Dynamics-row sparsity of the RK2 double-integrator step: velocity
    # rows depend only on the (input) accelerations, so their (A−I) rows
    # are identically zero; every row of B is live (positions get the
    # RK2 half-step dt²/2 acceleration term). Completeness enforced
    # against AD by tests/test_analytic_jac.py.
    n_pos = 7 + 3 * nc                      # r, o, c — the position block
    nx_total = state_layout.total

    ocp = OCP(
        ns=ns,
        dt=cfg.dt,
        state_layout=state_layout,
        input_layout=input_layout,
        step=step,
        xdot=xdot,
        stage_residual=stage_residual,
        terminal_residual=terminal_residual,
        stage_eq=stage_eq,
        terminal_eq=terminal_eq,
        stage_ineq=stage_ineq,
        eq_scale=eq_scale,
        eq_rho_weight=jnp.asarray(eq_rho_w, dtype),
        eq_rho_weight_T=jnp.asarray(eq_rho_w_T, dtype),
        ineq_lb=ineq_lb,
        ineq_ub=ineq_ub,
        residual_x_rows=tuple(res_x_rows),
        residual_u_rows=tuple(res_u_rows),
        dynamics_x_rows=tuple(range(n_pos)),
        dynamics_u_rows=tuple(range(nx_total)),
        # forces never enter the double-integrator dynamics (they are pure
        # residual/constraint variables, isrbd_example.py:109-135): only
        # the acceleration inputs rddot, wdot, cddot{i} are live B columns
        dynamics_u_cols=tuple(
            list(range(6))
            + [6 + 6 * i + j for i in range(nc) for j in range(3)]
        ),
        # friction cones are pure force (input) rows
        ineq_x_rows=(),
        ineq_u_rows=tuple(range(nc * 5)),
        x_lb=x_lb,
        x_ub=x_ub,
        u_lb=u_lb,
        u_ub=u_ub,
        params=params,
        constants=dict(com=com, feet0=feet0, m=m, inertia=inertia),
    )

    x0 = jnp.concatenate([
        com, jnp.array([0.0, 0.0, 0.0, 1.0], dtype), feet0.reshape(-1),
        jnp.zeros(6 + 3 * nc, dtype),
    ])
    # static input: zero accelerations, weight/nc upward per contact (raw N)
    per_contact = jnp.concatenate(
        [jnp.zeros(3, dtype), jnp.array([0.0, 0.0, m * 9.81 / nc], dtype)]
    )
    u0 = jnp.concatenate([jnp.zeros(6, dtype), jnp.tile(per_contact, nc)])

    return ISRBDProblem(
        ocp=ocp,
        initial_state=x0,
        static_input=u0,
        com=com,
        initial_foot_position=feet0,
        inertia=inertia,
        mass=m,
        nc=nc,
        contact_model=cm,
    )
